"""Targeted re-measurement of the kernel_shard shapes whose policy
changed (015397c): row-parallel shards now PAD K up to the 8*g kernel
tile and run the packed kernel, mirroring the engine's
``_reshard_row_layers`` repack — the prior artifact timed them through
the dense bf16 fallback, which is why scaling.md's tp=4/8 rows were
labeled conservative.  A full kernel_shard.py rerun costs ~70 remote
compiles over the tunnel; only THREE shapes changed policy, so this
re-measures exactly those and merges them into docs/kernel_shard.json
(updating block sums and vs_ideal ratios).

Run on the real chip:  python scripts/kernel_shard_patch.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.kernel_shard import time_packed, _slope_for  # noqa: E402

# (tp, name, O_shard, K_shard, K_padded)
CHANGED = [
    (4, "down_proj", 4096, 3584, 4096),
    (8, "o_proj", 4096, 512, 1024),
    (8, "down_proj", 4096, 1792, 2048),
]


def main():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "kernel_shard.json")
    with open(path) as f:
        d = json.load(f)

    for tp, name, Os, Ks, Ks_pad in CHANGED:
        t = time_packed(Os, Ks_pad, d["bs"], T=_slope_for(Os * Ks_pad // 2))
        e = d["per_tp"][str(tp)]
        old = e["matmuls_us"][name]
        e["matmuls_us"][name] = round(t * 1e6, 2)
        e["dense_fallback"] = [x for x in e["dense_fallback"]
                               if not x.startswith(name + " ")]
        e.setdefault("padded", []).append(f"{name}: K {Ks}->{Ks_pad}")
        print(f"tp={tp} {name}: ({Os},{Ks_pad}) kernel "
              f"{t*1e6:.1f} us (was DENSE {old:.1f})", flush=True)

    t1_sum = d["per_tp"]["1"]["block_sum_us"]
    for tp, e in d["per_tp"].items():
        total = sum(e["matmuls_us"].values())
        e["block_sum_us"] = round(total, 2)
        if tp != "1":
            e["vs_ideal_div_tp"] = round(total / (t1_sum / int(tp)), 3)

    d["note"] = ("row-parallel shards re-measured through the padded-K "
                 "packed kernel (corrected policy, "
                 "scripts/kernel_shard_patch.py); column shards below "
                 "the O tile still serve dense, as the engine does")
    with open(path, "w") as f:
        json.dump(d, f, indent=1)
    print(json.dumps({k: e["block_sum_us"]
                      for k, e in d["per_tp"].items()}))


if __name__ == "__main__":
    main()
