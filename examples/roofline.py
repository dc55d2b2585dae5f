#!/usr/bin/env python
"""Per-program MFU / roofline measurement on the real TPU.

For each hot program (MossFormer2 separation window, fused frontend
analyze, fused Paraformer ASR+punc) this measures:

- analytic FLOPs + HBM bytes from XLA's own cost model
  (compiled.cost_analysis()),
- ON-DEVICE execution time, free of tunnel RTT / dispatch overhead:
  the program is run k times sequentially inside ONE jitted
  lax.fori_loop (inputs perturbed per iteration so XLA cannot CSE the
  calls), and time is taken as the slope between two loop lengths —
  d(wall)/d(k) = pure device time per call,
- achieved TFLOP/s, % of peak (MFU), achieved HBM GB/s, arithmetic
  intensity, and the roofline bound type (HBM vs MXU).

The reference never measures any of this (SURVEY.md §6: no published
numbers); the driver bar is "hardware-appropriate perf", which needs a
roofline to be meaningful (VERDICT r3 ask 3).

Usage (real TPU, from repo root, NO PYTHONPATH):  python examples/roofline.py
"""

import contextlib
import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

# TPU v5e (v5 lite) per-chip peaks; other device kinds fall back to v5e
# numbers with a note (the bench machine is a single v5e).
PEAKS = {
    "TPU v5 lite": {"bf16_flops": 197e12, "hbm_gbs": 819e9},
    "TPU v5e": {"bf16_flops": 197e12, "hbm_gbs": 819e9},
}


def device_peaks():
    import jax

    kind = jax.devices()[0].device_kind
    return kind, PEAKS.get(kind, PEAKS["TPU v5 lite"])


def _perturb(x, i):
    import jax.numpy as jnp

    if jnp.issubdtype(x.dtype, jnp.integer):
        return x ^ (i % 2).astype(x.dtype)
    # 1% steps: must stay representable after casting to bf16 (eps
    # ~0.39%), or XLA unrolls the loop, constant-folds the scale to 1.0,
    # and CSEs every iteration into one call
    return x * (1.0 + 0.01 * i.astype(jnp.float32)).astype(x.dtype)


def measure(name, fn, args, perturb_idx, k_lo=2, k_hi=10):
    """On-device seconds/call via the fori-loop slope, plus XLA cost
    analysis. `args[perturb_idx]` must be an array input (audio)."""
    import jax
    import jax.numpy as jnp

    # ---- cost analysis of the single-call program
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    nbytes = float(cost.get("bytes accessed", 0.0))

    # ---- k-call loop program (device-resident, one dispatch)
    @partial(jax.jit, static_argnums=0)
    def loop(k, *a):
        def body(i, acc):
            aa = list(a)
            aa[perturb_idx] = _perturb(aa[perturb_idx], i)
            out = fn(*aa)
            # fold EVERY output leaf into the carry — otherwise XLA
            # dead-code-eliminates the parts of the program that don't
            # feed the scalar, and the "device time" measures a pruned
            # program
            tot = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
            return acc + tot

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def run(k):
        # device_get of the f32 scalar is the completion barrier:
        # block_until_ready can return early through the axon tunnel
        # (the round-1 413-TFLOP/s retraction repeated itself here), and
        # a 4-byte transfer adds nothing to the k-slope
        jax.device_get(loop(k, *args))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(loop(k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(k_lo), run(k_hi)
    t_dev = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
    return {"program": name, "flops": flops, "bytes": nbytes,
            "t_device_ms": t_dev * 1e3}


def finish(row, peaks):
    f, b, t = row["flops"], row["bytes"], row["t_device_ms"] / 1e3
    ai = f / max(b, 1.0)
    ridge = peaks["bf16_flops"] / peaks["hbm_gbs"]
    row.update({
        "tflops_per_s": f / t / 1e12,
        "mfu_pct": 100.0 * f / t / peaks["bf16_flops"],
        "hbm_gbs": b / t / 1e9,
        "hbm_util_pct": 100.0 * b / t / peaks["hbm_gbs"],
        "arith_intensity": ai,
        "bound": "HBM" if ai < ridge else "MXU",
        # % of the roofline-achievable rate for this AI — the honest
        # "how close to speed-of-light" number for HBM-bound programs
        "roofline_pct": 100.0 * (f / t) / min(
            peaks["bf16_flops"], ai * peaks["hbm_gbs"]),
    })
    return row


def main():
    import jax
    import jax.numpy as jnp

    import bench

    bench.enable_compile_cache()
    kind, peaks = device_peaks()
    print(f"device: {kind}  peak bf16 {peaks['bf16_flops']/1e12:.0f} TFLOP/s, "
          f"HBM {peaks['hbm_gbs']/1e9:.0f} GB/s, "
          f"ridge AI {peaks['bf16_flops']/peaks['hbm_gbs']:.0f} FLOP/B",
          file=sys.stderr)

    from targetdiarization_tpu.utils.audio_io import read_audio

    audio, sr = read_audio("/root/reference/assets/chat_mix.wav")
    audio = np.asarray(audio)

    with contextlib.redirect_stdout(sys.stderr):
        td = bench.build_pipeline(fast=False)
        td.infer("/root/reference/assets/chat_mix.wav",
                 target_file="/root/reference/assets/female_a.wav",
                 output_target_audio=False)

    rows = []

    # ---- 1. MossFormer2 production separation, 8 s window
    sep = td.ap.separator
    w = 128_000
    wav = jnp.asarray((np.random.default_rng(0)
                       .standard_normal((1, w)) * 0.1).astype(np.float32))
    lens = jnp.asarray(np.full((1,), w, np.int32))
    row = measure("mossformer2_sep_8s",
                  lambda p, x, l: sep._apply(p, x, l),
                  (sep._params_c, wav, lens), 1, k_lo=1, k_hi=5)
    # scan correction: XLA cost analysis counts a While-loop body ONCE
    # regardless of trip count, so the 24-block scanned tower's FLOPs/
    # bytes are undercounted by (num_blocks − 1) × body. Measure the
    # body program's own cost and add it back.
    try:
        from targetdiarization_tpu.models.separation import _MossScanBody

        m = sep.model
        t_enc = (w - m.kernel_size) // (m.kernel_size // 2) + 1
        t_pad = t_enc + (-t_enc) % m.group_size
        body = _MossScanBody(dim=m.dim, group_size=m.group_size,
                             qk_dim=m.qk_dim, fsmn_inner=m.fsmn_inner)
        bx = jnp.zeros((1, t_pad, m.dim), jnp.bfloat16)
        bm = jnp.ones((1, t_pad), jnp.bfloat16)
        bp = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a,
            body.init(jax.random.PRNGKey(0), bx, bm))
        bcost = jax.jit(
            lambda p, x, mk: body.apply(p, x, mk)[0]
        ).lower(bp, bx, bm).compile().cost_analysis()
        if isinstance(bcost, (list, tuple)):
            bcost = bcost[0] if bcost else {}
        row["flops"] += (m.num_blocks - 1) * float(bcost.get("flops", 0.0))
        row["bytes"] += (m.num_blocks - 1) * float(
            bcost.get("bytes accessed", 0.0))
        row["scan_corrected"] = True
    except Exception as e:
        print(f"scan correction skipped: {e}", file=sys.stderr)
    rows.append(row)

    # ---- 2. fused frontend analyze (preprocess+denoise+VAD+seg+embs)
    fe = td.fused
    from targetdiarization_tpu.pipeline.fused import _LADDER
    from targetdiarization_tpu.runtime.buckets import pad_to

    bucket = _LADDER.bucket(len(audio))
    fn = fe._analyze_cache[bucket]
    a16 = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
    dn_p = fe.denoiser._params_c if fe.denoiser is not None else None
    seg_p = fe.seg._params_c if fe.seg is not None else None
    a_dev = jnp.asarray(pad_to(a16, bucket))
    rows.append(measure(
        f"fused_analyze_{bucket//16000}s",
        lambda d, v, s, k, x, n: fn(d, v, s, k, x, n),
        (dn_p, fe.vad._params_c, seg_p, fe.spk._params_c, a_dev,
         jnp.asarray(len(audio))), 4))

    # ---- 3. fused Paraformer ASR + punctuation (as built by infer)
    fa = td.fused_asr
    key = sorted(fa._cache)[0]
    bucket_a, n_spk, max_segs = key
    afn = fa._cache[key]
    ranges = np.zeros((n_spk, max_segs, 2), np.float32)
    ranges[:, 0] = (0.0, float(bucket_a))
    n_lfr = np.full((n_spk,), 140, np.int32)
    punc_p = fa.punc._params_c if fa.punc is not None else None
    a_dev2 = jnp.asarray(pad_to(a16, bucket_a))
    rows.append(measure(
        f"fused_asr_punc_{bucket_a//16000}s_x{n_spk}",
        lambda ap, pp, x, r, n: afn(ap, pp, x, r, n),
        (fa.asr._params_c, punc_p, a_dev2, jnp.asarray(ranges),
         jnp.asarray(n_lfr)), 2))

    for r in rows:
        finish(r, peaks)
    hdr = (f"{'program':<26} {'dev ms':>7} {'GFLOP':>8} {'GB':>7} "
           f"{'TF/s':>6} {'MFU%':>5} {'GB/s':>6} {'HBM%':>5} "
           f"{'AI':>6} {'bound':>5} {'roof%':>6}")
    print(hdr, file=sys.stderr)
    for r in rows:
        print(f"{r['program']:<26} {r['t_device_ms']:>7.2f} "
              f"{r['flops']/1e9:>8.1f} {r['bytes']/1e9:>7.3f} "
              f"{r['tflops_per_s']:>6.2f} {r['mfu_pct']:>5.1f} "
              f"{r['hbm_gbs']:>6.1f} {r['hbm_util_pct']:>5.1f} "
              f"{r['arith_intensity']:>6.1f} {r['bound']:>5} "
              f"{r['roofline_pct']:>6.1f}", file=sys.stderr)
    print(json.dumps({"device": kind, "rows": rows}))


if __name__ == "__main__":
    main()
