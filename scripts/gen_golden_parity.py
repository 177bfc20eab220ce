"""Generate golden parity fixtures by RUNNING the reference's own quant
functions (torch CPU) on fixed inputs.

Usage (requires /root/reference mounted):
    python scripts/gen_golden_parity.py tests/goldens/reference_qdq.npz

The goldens are committed so tests/test_reference_parity.py can assert
our JAX simulators reproduce the reference numerics without importing
torch at test time.  No reference code is copied — only its outputs.
"""

import sys
import types

import numpy as np


def main(out_path: str) -> None:
    # stub optional deps the reference imports at module load
    cpuinfo = types.ModuleType("cpuinfo")
    cpuinfo.get_cpu_info = lambda: {"brand_raw": "stub"}
    sys.modules.setdefault("cpuinfo", cpuinfo)
    sys.path.insert(0, "/root/reference")

    import torch
    from auto_round.data_type.int import quant_tensor_asym, quant_tensor_sym
    from auto_round.data_type.mxfp import quant_mx, quant_mx_rceil
    from auto_round.data_type.nvfp import nv_fp4

    rng = np.random.default_rng(1234)
    w = rng.standard_normal((16, 256)).astype(np.float32) * 0.1
    t = torch.from_numpy(w)
    goldens = {"input": w}

    for bits in (2, 4, 8):
        for g in (32, 128):
            qdq, scale, _ = quant_tensor_sym(
                t.clone(), bits=bits, group_size=g,
                scale_dtype=torch.float32)
            goldens[f"int_sym_b{bits}_g{g}"] = qdq.numpy()
            qdq, scale, zp = quant_tensor_asym(
                t.clone(), bits=bits, group_size=g,
                scale_dtype=torch.float32)
            goldens[f"int_asym_b{bits}_g{g}"] = qdq.numpy()

    # tuned-path inputs: nonzero v and clip scales
    v = torch.from_numpy(
        rng.uniform(-0.4, 0.4, (16 * 256 // 128, 128)).astype(np.float32))
    ms = torch.from_numpy(
        rng.uniform(0.7, 1.0, (16 * 256 // 128,)).astype(np.float32))
    qdq, _, _ = quant_tensor_sym(t.clone(), bits=4, group_size=128, v=v,
                                 min_scale=ms, max_scale=ms,
                                 scale_dtype=torch.float32)
    goldens["int_sym_b4_g128_tuned"] = qdq.numpy()
    goldens["tuned_v"] = v.numpy()
    goldens["tuned_ms"] = ms.numpy()

    for name, fn in (("mx_floor", quant_mx), ("mx_rceil", quant_mx_rceil)):
        for dt, bits in (("mx_fp4", 4), ("mx_fp8", 8)):
            qdq, _, _ = fn(t.clone(), bits=bits, group_size=32, data_type=dt)
            goldens[f"{name}_{dt}"] = qdq.numpy()
        # 6-bit element formats (reference "mx_fp6"=e2m3, "mx_fp6e3m2");
        # goldens keyed by OUR dtype names
        for ref_dt, our_dt in (("mx_fp6", "mx_fp6_e2m3"),
                               ("mx_fp6e3m2", "mx_fp6_e3m2")):
            qdq, _, _ = fn(t.clone(), bits=6, group_size=32,
                           data_type=ref_dt)
            goldens[f"{name}_{our_dt}"] = qdq.numpy()

    qdq, _, _ = nv_fp4(t.clone(), bits=4, group_size=16)
    goldens["nvfp4"] = qdq.numpy()

    from auto_round.data_type.nvfp import (fp4_v2,
                                           fp4_v2_with_global_scale)
    for g in (16, 32):
        qdq, _, _ = fp4_v2(t.clone(), bits=4, group_size=g)
        goldens[f"fp4_v2_g{g}"] = qdq.numpy()
        qdq, _, _ = fp4_v2_with_global_scale(t.clone(), bits=4,
                                             group_size=g)
        goldens[f"fp4_v2_gs_g{g}"] = qdq.numpy()

    # GGUF block-packer bytes (reference export_to_gguf/packing.py) — the
    # committed bytes validate our ggml-layout decoders.  NOTE: these
    # packers mutate their input in place; always pass clones.
    from auto_round.export.export_to_gguf import packing as gp
    wg = torch.from_numpy(w[:, :256].copy())
    # the reference packers take input pre-reshaped into format blocks:
    # 32 elems for q8_0/q4_0, 256 for the k-quants
    for name, fn, blk in (("q8_0", gp.q8_0_quant_block, 32),
                          ("q4_0", gp.q4_0_quant_block, 32),
                          ("q4_1", gp.q4_1_quant_block, 32),
                          ("q5_0", gp.q5_0_quant_block, 32),
                          ("q5_1", gp.q5_1_quant_block, 32),
                          ("q4_k", gp.q4_k_quant_block, 256),
                          ("q6_k", gp.q6_k_quant_block, 256),
                          ("q3_k", gp.q3_k_quant_block, 256),
                          ("q5_k", gp.q5_k_quant_block, 256),
                          ("q2_k", gp.q2_k_quant_block, 256)):
        raw = np.asarray(fn(wg.clone().reshape(-1, blk)))
        goldens[f"gguf_bytes_{name}"] = raw.astype(np.uint8)
    goldens["gguf_input"] = wg.numpy()

    # explicit-scale packer branch: deterministic bytes (no RMSE search)
    # for EXACT byte-layout checks of the k-quant high-bit formats
    rng2 = np.random.default_rng(7)
    nb = 4
    d3 = np.full((nb,), 0.01, np.float32)
    k3 = rng2.integers(-32, 32, (nb, 16)).astype(np.float32)
    w3 = rng2.standard_normal((nb, 256)).astype(np.float32) * 0.02
    raw3 = np.asarray(gp.q3_k_quant_block(
        torch.tensor(w3.copy()), scale=torch.tensor(k3 * d3[:, None]),
        d_scale=torch.tensor(d3)))
    # expected qdq via the packer's own arithmetic: codes come from the
    # float32 scale the packer received; the DECODE scale is the f16-
    # rounded d times the 6-bit sub-scale (what the bytes store).  Using
    # the f16 scale for the codes too was a fixture bug — one element at
    # a 0.5 rounding boundary flipped.
    sc_pack = torch.tensor(k3) * torch.tensor(d3)[:, None]
    inv = torch.where(sc_pack == 0, torch.zeros_like(sc_pack),
                      1.0 / sc_pack)
    L3 = (torch.tensor(w3).reshape(nb, 16, 16)
          * inv.unsqueeze(-1)).round().clamp(-4, 3)
    d16 = torch.tensor(d3).to(torch.float16).to(torch.float32)
    sc_dec = torch.tensor(k3) * d16[:, None]
    goldens["gguf_q3k_exact_bytes"] = raw3.astype(np.uint8)
    goldens["gguf_q3k_exact_want"] = (
        L3 * sc_dec.unsqueeze(-1)).reshape(nb, 256).numpy()

    d5s = np.full((nb,), 0.012, np.float32)
    d5m = np.full((nb,), 0.008, np.float32)
    k5s = rng2.integers(0, 64, (nb, 8)).astype(np.float32)
    k5m = rng2.integers(0, 64, (nb, 8)).astype(np.float32)
    w5 = rng2.standard_normal((nb, 256)).astype(np.float32) * 0.05
    raw5 = np.asarray(gp.q5_k_quant_block(
        torch.tensor(w5.copy()), scale=torch.tensor(k5s * d5s[:, None]),
        wmin=torch.tensor(k5m * d5m[:, None]),
        d_scale=torch.tensor(d5s), d_wmin=torch.tensor(d5m)))
    # q5_k's packer (unlike q3_k's) derives its code scale from the f16-
    # rounded supers times the requantized 6-bit subscales (packing.py:907-917)
    ds16 = torch.tensor(d5s).to(torch.float16).to(torch.float32)
    dm16 = torch.tensor(d5m).to(torch.float16).to(torch.float32)
    dt = torch.tensor(k5s) * ds16[:, None]
    mt = torch.tensor(k5m) * dm16[:, None]
    dts = torch.where(dt == 0, torch.ones_like(dt), dt)
    L5 = ((torch.tensor(w5).reshape(nb, 8, 32) + mt.unsqueeze(-1))
          * (1.0 / dts).unsqueeze(-1)).round().clamp(0, 31)
    goldens["gguf_q5k_exact_bytes"] = raw5.astype(np.uint8)
    goldens["gguf_q5k_exact_want"] = (
        L5 * dt.unsqueeze(-1) - mt.unsqueeze(-1)).reshape(nb, 256).numpy()

    np.savez_compressed(out_path, **goldens)
    print(f"wrote {len(goldens)} goldens -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "tests/goldens/reference_qdq.npz")
