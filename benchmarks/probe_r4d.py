"""Round-4 probe D: decompose the fused-GAT backward (probe_r4c shows
fwd 31 ms but fwd+bwd 161 ms — where do the ~130 ms of backward go?).

Times, at probe_r2j's arxiv config:
  dst   : dst-space passes A+B only (c + der)
  rev   : src-space pass only (del + dh), given precomputed mx/s/c
  segres: the reverse-residual segment_sums alone (zipf graphs put most
          edges past SHELL_CAP on the src side)

Run: timeout 580 python benchmarks/probe_r4d.py [mode]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

import dgl_tpu
from dgl_tpu.ops import fused_gat as fg
from dgl_tpu.ops.shell_spmm import _rup, prefix_reduce

N, E, H, O = 169_343, 1_166_243, 4, 32


def log(*a):
    print(*a, flush=True)


def build():
    rng = np.random.default_rng(0)
    w = 1.0 / np.arange(1, N + 1)
    src = rng.choice(N, E, p=w / w.sum())
    dst = rng.integers(0, N, E)
    g0 = dgl_tpu.graph((src, dst), num_nodes=N)
    gw = g0.with_spmm_plans(num_hubs=2048, weighted=True)
    plan = gw._relation(None).shell_plan
    el = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    er = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(N, H, O)), jnp.float32)
    dz = jnp.asarray(rng.normal(size=(N, H, O)), jnp.float32)
    mx = jnp.asarray(rng.normal(size=(_rup(N, 8), H)), jnp.float32)
    s = jnp.asarray(np.abs(rng.normal(size=(_rup(N, 8), H))) + 1,
                    jnp.float32)
    c = jnp.asarray(rng.normal(size=(_rup(N, 8), H)), jnp.float32)
    return plan, el, er, h, dz, mx, s, c


def chain_timer(fn, args, iters=8):
    def t(k):
        kk = jnp.int32(k)
        float(fn(*args, kk))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(*args, kk))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(1 + iters) - t(1)) / iters


def dst_pass(plan, el, er, h, dz, mx, s, slope=0.2):
    gd = fg._gd(plan)
    n8d = _rup(plan.num_dst, 8)
    er_rank = fg._pad_rows(
        fg._ranked(er, plan.rank_dst).astype(jnp.float32), n8d)
    dz_rank = fg._pad_rows(fg._ranked(dz.astype(gd), plan.rank_dst), n8d)
    mx_pad = fg._pad_rows(mx, n8d)
    s_pad = jnp.maximum(fg._pad_rows(s, n8d), 1e-38)
    packed, _ = fg._src_pack(plan, el, h)
    res = plan.res_dst
    shell_ad = []
    pieces = []
    for nidx, _e, mask in plan.shells:
        m = nidx.shape[0]
        el_g, h_g = fg._src_rows(packed, H, (H, O), nidx)
        raw = el_g + er_rank[:m]
        alpha = (jnp.exp(fg._leaky(raw, slope) - mx[:m]) / s[:m]) * mask
        dalpha = jnp.einsum("eho,eho->eh", dz_rank[:m],
                            h_g).astype(jnp.float32)
        shell_ad.append((raw, alpha, dalpha))
        pieces.append(alpha * dalpha)
    base = None
    if res is not None and int(res[2].shape[0]) > 0:
        r_pos = res[2]
        el_g, h_g = fg._src_rows(packed, H, (H, O), res[0])
        raw_r = el_g + er_rank[r_pos]
        maskf = (r_pos < n8d)[:, None].astype(jnp.float32)
        alpha_r = (jnp.exp(fg._leaky(raw_r, slope) - mx_pad[r_pos])
                   / s_pad[r_pos]) * maskf
        dalpha_r = jnp.einsum("eho,eho->eh", dz_rank[r_pos],
                              h_g).astype(jnp.float32)
        base = jax.ops.segment_sum(alpha_r * dalpha_r, r_pos,
                                   num_segments=n8d,
                                   indices_are_sorted=True)
    c = prefix_reduce(pieces, n8d, kind="sum", base=base)
    pieces = [a * (d - c[: r.shape[0]]) * fg._dleaky(r, slope)
              for r, a, d in shell_ad]
    der = prefix_reduce(pieces, n8d, kind="sum", base=base)
    return jnp.sum(der) + jnp.sum(c)


def rev_pass(plan, el, er, h, dz, mx, s, c, slope=0.2):
    gd = fg._gd(plan)
    n8s = _rup(plan.num_src, 8)
    nd = plan.num_dst
    packed_rev = jnp.concatenate(
        [er.astype(gd), mx[:nd].astype(gd), s[:nd].astype(gd),
         c[:nd].astype(gd), dz.reshape(nd, -1).astype(gd)], axis=1)
    el_rank = fg._pad_rows(
        fg._ranked(el.astype(jnp.float32), plan.rank_src), n8s)
    h_rank = fg._pad_rows(fg._ranked(h.astype(gd), plan.rank_src), n8s)

    def rev_rows(nidx, maskf, el_pre, h_pre):
        pk = packed_rev[nidx]
        er_g = pk[:, :H].astype(jnp.float32)
        mx_g = pk[:, H:2 * H].astype(jnp.float32)
        s_g = pk[:, 2 * H:3 * H].astype(jnp.float32)
        c_g = pk[:, 3 * H:4 * H].astype(jnp.float32)
        dz_g = pk[:, 4 * H:].reshape(pk.shape[0], H, O)
        raw = el_pre + er_g
        alpha = (jnp.exp(fg._leaky(raw, slope) - mx_g)
                 / jnp.maximum(s_g, 1e-38)) * maskf
        dalpha = jnp.einsum("eho,eho->eh", dz_g, h_pre
                            ).astype(jnp.float32)
        dlogit = alpha * (dalpha - c_g) * fg._dleaky(raw, slope)
        dh_rows = (alpha.astype(gd)[..., None] * dz_g).astype(jnp.float32)
        return dlogit, dh_rows

    pieces_del, pieces_dh = [], []
    for nidx, _e, mask in plan.rev_shells:
        m = nidx.shape[0]
        dlogit, dh_rows = rev_rows(nidx, mask, el_rank[:m], h_rank[:m])
        pieces_del.append(dlogit)
        pieces_dh.append(dh_rows)
    base_del = base_dh = None
    rres = plan.res_src
    if rres is not None and int(rres[2].shape[0]) > 0:
        r_pos = rres[2]
        maskf = (r_pos < n8s)[:, None].astype(jnp.float32)
        dlogit_r, dh_r = rev_rows(rres[0], maskf, el_rank[r_pos],
                                  h_rank[r_pos])
        base_del = jax.ops.segment_sum(dlogit_r, r_pos, num_segments=n8s,
                                       indices_are_sorted=True)
        base_dh = jax.ops.segment_sum(dh_r, r_pos, num_segments=n8s,
                                      indices_are_sorted=True)
    del_rank = prefix_reduce(pieces_del, n8s, kind="sum", base=base_del)
    dh_rank = prefix_reduce(pieces_dh, n8s, kind="sum", base=base_dh)
    return jnp.sum(del_rank) + jnp.sum(dh_rank)


def segres_only(plan, el, er, h, dz, mx, s, c):
    gd = fg._gd(plan)
    n8s = _rup(plan.num_src, 8)
    rres = plan.res_src
    r_pos = rres[2]
    rows = dz.astype(gd).reshape(plan.num_dst, -1)[rres[0] % plan.num_dst]
    dh_r = rows.reshape(rows.shape[0], H, O).astype(jnp.float32)
    out = jax.ops.segment_sum(dh_r, r_pos, num_segments=n8s,
                              indices_are_sorted=True)
    return jnp.sum(out)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "dst"
    log("devices:", jax.devices())
    plan, el, er, h, dz, mx, s, c = build()
    rres = plan.res_src
    log(f"shells fwd={len(plan.shells)} rev={len(plan.rev_shells)} "
        f"res_dst={0 if plan.res_dst is None else plan.res_dst[2].shape[0]} "
        f"res_src={0 if rres is None else rres[2].shape[0]}")

    if mode == "dst":
        fn = lambda *a: dst_pass(*a)
        args = (plan, el, er, h, dz, mx, s)
    elif mode == "rev":
        fn = lambda *a: rev_pass(*a)
        args = (plan, el, er, h, dz, mx, s, c)
    else:
        fn = lambda *a: segres_only(*a)
        args = (plan, el, er, h, dz, mx, s, c)

    @jax.jit
    def chain(*a):
        *xs, k = a
        # thread the scalar back into an INPUT so XLA can't hoist the
        # loop-invariant pass out of the chain
        def body(_, carry):
            acc, dzc = carry
            r = fn(*xs[:4], dzc, *xs[5:]) * 1e-6
            return (acc + r, dzc * (1.0 + r * 1e-30))

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), xs[4]))
        return acc

    dt = chain_timer(chain, args, iters=8)
    log(f"{mode}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
