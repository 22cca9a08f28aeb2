"""Graph attention network layer.

Reference: ``python/dgl/nn/pytorch/conv/gatconv.py`` — the SDDMM +
edge-softmax + SpMM attention path (``apply_edges(u_add_v)`` at :337,
``edge_softmax`` at :344, ``update_all(u_mul_e, sum)`` at :346).
"""
from __future__ import annotations

from typing import Callable, Optional

from flax import linen as nn

from ... import function as fn
from ...ops import edge_softmax
from .graphconv import expand_as_pair, check_zero_in_degree


class GATConv(nn.Module):
    """GAT layer (reference ``gatconv.py:17``)."""

    in_feats: int
    out_feats: int
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    activation: Optional[Callable] = None
    allow_zero_in_degree: bool = False
    bias: bool = True
    # dtype for the dense fast path's (H, N_dst, N_src) attention tensor.
    # bf16 halves that path's whole cost (its N^2*H HBM traffic); the
    # resulting grads match the f32/sparse path to ~2e-2 L2-relative
    # (pinned by tests/test_dense_attn.py::test_dense_path_bf16_error_bound;
    # the math itself is exact — f32 parity is at 1e-5). Set to
    # ``jnp.float32`` for exact parity with the per-edge route.
    dense_compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, graph, feat, edge_weight=None, get_attention=False,
                 deterministic: bool = True):
        check_zero_in_degree(graph, self.allow_zero_in_degree)
        H, O = self.num_heads, self.out_feats
        with graph.local_scope() as g:
            feat_src, feat_dst = expand_as_pair(feat, g)
            if self.feat_drop > 0 and not deterministic:
                drop = nn.Dropout(self.feat_drop, deterministic=False)
                feat_src, feat_dst = drop(feat_src), drop(feat_dst)
            fc = nn.Dense(
                H * O,
                use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(),
                name="fc",
            )
            h_src = fc(feat_src).reshape(-1, H, O)
            h_dst = fc(feat_dst).reshape(-1, H, O)
            attn_l = self.param(
                "attn_l", nn.initializers.xavier_uniform(), (1, H, O), h_src.dtype
            )
            attn_r = self.param(
                "attn_r", nn.initializers.xavier_uniform(), (1, H, O), h_src.dtype
            )
            el = (h_src * attn_l).sum(-1, keepdims=True)  # (N_src, H, 1)
            er = (h_dst * attn_r).sum(-1, keepdims=True)  # (N_dst, H, 1)

            # small-graph fast path: fused dense masked attention on the
            # MXU (ops/dense_attn.py) — identical math, ~30 XLA ops vs
            # hundreds of per-edge ops (the op-count floor dominates small
            # graphs). Requires a dense_adj plan (Graph.with_spmm_plans)
            # and no per-edge weights.
            rel = g._relation(None) if len(g.canonical_etypes) == 1 else None
            if (
                rel is not None
                and rel.dense_adj is not None
                and edge_weight is None
                and not get_attention
            ):
                from ...ops.dense_attn import dense_masked_attention

                import jax
                import jax.numpy as jnp

                drop_fn = None
                if self.attn_drop > 0 and not deterministic:
                    # hardware RNG (rbg) for the (H, N, N) dropout mask:
                    # threefry costs ~2.5 ms/layer extra at Cora shapes
                    # (generation + backward remat); rbg measured
                    # 5.7 -> 3.2 ms per layer fwd+bwd (probe_r3f)
                    kd = jax.random.key_data(self.make_rng("dropout"))
                    rk = jax.random.wrap_key_data(
                        jnp.tile(kd.astype(jnp.uint32).ravel(), 2)[:4],
                        impl="rbg",
                    )
                    keep = 1.0 - self.attn_drop

                    def drop_fn(a):
                        bits = jax.random.bernoulli(rk, keep, a.shape)
                        return a * bits.astype(a.dtype) / keep

                rst = dense_masked_attention(
                    rel.dense_adj, el[:, :, 0], er[:, :, 0], h_src,
                    negative_slope=self.negative_slope, dropout_fn=drop_fn,
                    compute_dtype=jnp.dtype(self.dense_compute_dtype),
                )
                return self._finish(rst, feat_dst, H, O)

            # Reddit-class fast path: bitmap-flash attention
            # (ops/bitmap_gat.py) — rank-1 logits + plane-packed bitmap
            # mask + online softmax on the MXU; cost ~ N^2*H cells,
            # independent of E and degree skew. Selected when a bitmap
            # plan is attached (Graph.with_spmm_plans(bitmap=...)).
            # attn_drop falls through to the per-edge paths (an (E,)
            # dropout mask contradicts the never-materialize-E design).
            if (
                rel is not None
                and getattr(rel, "bitmap_plan", None) is not None
                and edge_weight is None
                and not get_attention
                and (self.attn_drop == 0 or deterministic)
            ):
                from ...ops.bitmap_gat import bitmap_gat

                rst = bitmap_gat(self.negative_slope, rel.bitmap_plan,
                                 el[:, :, 0], er[:, :, 0], h_src)
                return self._finish(rst, feat_dst, H, O)

            # large-graph fast path: fused shell-space attention
            # (ops/fused_gat.py) — logits, softmax and apply never leave
            # rank space; hand-derived VJP (no autodiff through the shell
            # chains). 488 -> ~60 ms per arxiv-scale layer fwd+bwd
            # (probe_r2j vs probe_r4c).
            if (
                rel is not None
                and rel.shell_plan is not None
                and edge_weight is None
                and not get_attention
            ):
                from ...ops.fused_gat import fused_gat_attention

                drop = None
                if self.attn_drop > 0 and not deterministic:
                    # (E, H) eid-keyed mask (dropout AFTER softmax, the
                    # reference's attn_drop); hardware RNG — see the
                    # dense-path note above
                    import jax
                    import jax.numpy as jnp

                    kd = jax.random.key_data(self.make_rng("dropout"))
                    rk = jax.random.wrap_key_data(
                        jnp.tile(kd.astype(jnp.uint32).ravel(), 2)[:4],
                        impl="rbg",
                    )
                    keep = 1.0 - self.attn_drop
                    drop = jax.random.bernoulli(
                        rk, keep, (graph.num_edges(), H)
                    ).astype(h_src.dtype) / keep
                rst = fused_gat_attention(
                    self.negative_slope, rel.shell_plan,
                    el[:, :, 0], er[:, :, 0], h_src, drop,
                )
                return self._finish(rst, feat_dst, H, O)

            g.srcdata.update({"ft": h_src, "el": el})
            g.dstdata.update({"er": er})
            g.apply_edges(fn.u_add_v("el", "er", "e"))
            e = nn.leaky_relu(g.edata["e"], negative_slope=self.negative_slope)
            a = edge_softmax(g, e)
            if edge_weight is not None:
                a = a * edge_weight.reshape(-1, 1, 1)
            if self.attn_drop > 0 and not deterministic:
                a = nn.Dropout(self.attn_drop, deterministic=False)(a)
            g.edata["a"] = a
            g.update_all(fn.u_mul_e("ft", "a", "m"), fn.sum("m", "ft"))
            rst = g.dstdata["ft"]  # (N_dst, H, O)
            rst = self._finish(rst, feat_dst, H, O)
            if get_attention:
                return rst, a
            return rst

    def _finish(self, rst, feat_dst, H, O):
        if self.residual:
            res_fc = nn.Dense(
                H * O,
                use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(),
                name="res_fc",
            )
            rst = rst + res_fc(feat_dst).reshape(-1, H, O)
        if self.bias:
            rst = rst + self.param(
                "bias", nn.initializers.zeros, (1, H, O), rst.dtype
            )
        if self.activation is not None:
            rst = self.activation(rst)
        return rst
