"""TWIRLS conv (reference ``python/dgl/nn/pytorch/conv/twirlsconv.py``):
MLP -> unrolled graph-smoothing propagation (with optional attention
reweighting) -> MLP, from "Graph Neural Networks Inspired by Classical
Iterative Algorithms" (arXiv:2103.06064)."""
from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn


class TWIRLSUnfoldingAndAttention(nn.Module):
    """Propagation block (reference ``twirlsconv.py`` ``TWIRLSUnfoldingAndAttention``).

    y_{k+1} = (1/(1+lam)) (y_0 + lam * D^-1/2 A D^-1/2 y_k), ``prop_step``
    times; optional attention reweights edges by an inverse-distance kernel
    after ``attn_aft`` steps (rho(z) = z^{p-2} on ||y_u - y_v||).
    """

    prop_step: int
    lam: float = 1.0
    alp: float = 0.0
    attention: bool = False
    attn_aft: int = -1
    p: float = 1.0
    tau: float = 0.2

    @nn.compact
    def __call__(self, g, x):
        lam = self.lam
        alp = self.alp if self.alp > 0 else 1.0 / (1.0 + lam)
        deg_in = jnp.maximum(g.in_degrees().astype(x.dtype), 1)
        deg_out = jnp.maximum(g.out_degrees().astype(x.dtype), 1)
        ni = jax.lax.rsqrt(deg_in + lam)[:, None]
        no = jax.lax.rsqrt(deg_out + lam)[:, None]
        attn_aft = self.attn_aft if self.attention else -1
        y0 = x
        y = x
        ew = None
        for step in range(self.prop_step):
            with g.local_scope() as gg:
                gg.srcdata["h"] = y * no
                if ew is not None:
                    gg.edata["w"] = ew
                    gg.update_all(fn.u_mul_e("h", "w", "m"), fn.sum("m", "h"))
                else:
                    gg.update_all(fn.copy_u("h", "m"), fn.sum("m", "h"))
                agg = gg.dstdata["h"] * ni
            # gradient step on the TWIRLS energy: with the default step size
            # alp = 1/(1+lam) this reduces to y = (y0 + lam * A~ y) / (1+lam)
            y = (1 - alp * (1 + lam)) * y + alp * y0 + alp * lam * agg
            if step == attn_aft:
                with g.local_scope() as gg:
                    gg.srcdata["y"] = y
                    gg.dstdata["y"] = y[: gg.num_dst_nodes()]
                    gg.apply_edges(fn.u_sub_v("y", "y", "d"))
                    dist = jnp.linalg.norm(gg.edata["d"], axis=-1,
                                           keepdims=True)
                ew = jnp.power(dist + self.tau, self.p - 2.0)
        return y


class TWIRLSConv(nn.Module):
    """(reference ``twirlsconv.py:11``)."""

    input_d: int
    output_d: int
    hidden_d: int
    prop_step: int
    num_mlp_before: int = 1
    num_mlp_after: int = 1
    norm: str = "none"
    precond: bool = True
    alp: float = 0.0
    lam: float = 1.0
    attention: bool = False
    tau: float = 0.2
    p: float = 1.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, graph, feat, deterministic: bool = True):
        h = feat
        for i in range(self.num_mlp_before):
            h = nn.Dense(self.hidden_d, name=f"mlp_bef{i}")(h)
            h = jax.nn.relu(h)
            if self.dropout > 0 and not deterministic:
                h = nn.Dropout(self.dropout, deterministic=False)(h)
        h = TWIRLSUnfoldingAndAttention(
            self.prop_step, self.lam, self.alp, self.attention,
            self.prop_step // 2 if self.attention else -1,
            self.p, self.tau, name="prop",
        )(graph, h)
        for i in range(self.num_mlp_after):
            out_d = self.output_d if i == self.num_mlp_after - 1 else self.hidden_d
            h = nn.Dense(out_d, name=f"mlp_aft{i}")(h)
            if i != self.num_mlp_after - 1:
                h = jax.nn.relu(h)
        return h


# -- functional TWIRLS pieces (reference ``twirlsconv.py:228-700``) -----------


def AX(graph, X):
    """Y = AX, optionally edge-weighted by ``edata['w']`` (reference
    ``twirlsconv.py:442``)."""
    with graph.local_scope() as g:
        g.srcdata["h"] = X
        if "w" in g.edata:
            g.update_all(fn.u_mul_e("h", "w", "m"), fn.sum("m", "h"))
        else:
            g.update_all(fn.copy_u("h", "m"), fn.sum("m", "h"))
        return g.dstdata["h"]


def D_power_X(graph, X, power):
    """Y = D^{power} X (reference ``twirlsconv.py:455``); degrees read
    from ``ndata['deg']`` when present (the reference contract), else
    in-degrees."""
    degs = graph.ndata.get("deg")
    if degs is None:
        degs = graph.in_degrees().astype(X.dtype)
    norm = jnp.power(jnp.asarray(degs, X.dtype), power)
    return X * norm[:, None]


def D_power_bias_X(graph, X, power, coeff, bias):
    """Y = (coeff*D + bias*I)^{power} X (reference ``twirlsconv.py:464``)."""
    degs = graph.ndata.get("deg")
    if degs is None:
        degs = graph.in_degrees().astype(X.dtype)
    norm = jnp.power(coeff * jnp.asarray(degs, X.dtype) + bias, power)
    return X * norm[:, None]


def normalized_AX(graph, X):
    """Y = D^{-1/2} A D^{-1/2} X (reference ``twirlsconv.py:432``)."""
    return D_power_X(graph, AX(graph, D_power_X(graph, X, -0.5)), -0.5)


class Propagate(nn.Module):
    """Pre-conditioned propagation step (reference ``twirlsconv.py:228``,
    eq. 28): Y <- (1-alp(1+lam)) Y + alp X + alp lam A~ Y with
    A~ = (lam D + (1-lam) I)^{-1/2} A (lam D + (1-lam) I)^{-1/2}."""

    def _prop(self, graph, Y, lam):
        Y = D_power_bias_X(graph, Y, -0.5, lam, 1 - lam)
        Y = AX(graph, Y)
        return D_power_bias_X(graph, Y, -0.5, lam, 1 - lam)

    def __call__(self, graph, Y, X, alp, lam):
        return (1 - alp) * Y + alp * X + alp * lam * self._prop(
            graph, Y, lam
        )


class PropagateNoPrecond(nn.Module):
    """Unconditioned variant (reference ``twirlsconv.py:283``, eq. 30)."""

    def __call__(self, graph, Y, X, alp, lam):
        return (
            (1 - alp * (1 + lam)) * Y
            + alp * X
            + alp * lam * normalized_AX(graph, Y)
        )


class Attention(nn.Module):
    """TWIRLS attention reweighting (reference ``twirlsconv.py:326``,
    eq. 27): w_uv = rho'(||y_u - y_v||) with double thresholding, stored
    in ``edata['w']``."""

    tau: float
    T: float
    p: float
    attn_dropout: float = 0.0

    def reweighting(self, graph, Y):
        with graph.local_scope() as g:
            g.srcdata["y"] = Y
            g.dstdata["y"] = Y[: g.num_dst_nodes()]
            g.apply_edges(fn.u_sub_v("y", "y", "d"))
            dist = jnp.linalg.norm(g.edata["d"], axis=-1)
        w = jnp.power(jnp.maximum(dist, self.tau), self.p - 2.0)
        if self.T > 0:
            w = jnp.minimum(w, jnp.power(
                jnp.asarray(self.T, w.dtype), self.p - 2.0))
        return w

    def __call__(self, graph, Y):
        graph.edata["w"] = self.reweighting(graph, Y)
        return graph


class MLP(nn.Module):
    """Plain MLP used around the TWIRLS unfolding (reference
    ``twirlsconv.py:607``)."""

    hidden_sizes: tuple
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i, h in enumerate(self.hidden_sizes):
            x = nn.Dense(h)(x)
            if i < len(self.hidden_sizes) - 1:
                x = jax.nn.relu(x)
                x = nn.Dropout(self.dropout)(
                    x, deterministic=deterministic
                )
        return x
