"""Serving-engine coverage for the extended kernel kinds: asym W4, W2,
W8 weight-only, FP8, MXFP4/NVFP4 (role of the reference's backend
breadth, ``inference/backend.py:209-650`` — every tuned dtype should
serve packed, not fall back to dense qdq bf16).

CPU runs the kernels' XLA reference paths; kind tagging / packing /
dispatch / fusion are what these tests pin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama
from autoround_tpu.serve import QuantizedLlama
from autoround_tpu.serve.engine import _serving_kind
from autoround_tpu.schemes import parse_scheme


@pytest.fixture(scope="module")
def cfg_params():
    # hidden 2048 so even the W2 16-plane packing (K % 2048 == 0) packs
    cfg = llama.LlamaConfig(vocab_size=128, hidden_size=2048,
                            intermediate_size=2048, num_layers=1,
                            num_heads=4, num_kv_heads=2, rope_theta=1e4,
                            dtype=jnp.float32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _quantize(cfg, params, scheme):
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    return AutoRound((params, cfg), scheme=scheme, iters=0).quantize(ids)


class TestServingKind:
    @pytest.mark.parametrize("scheme,kind", [
        ("W4A16", "w4a16"),
        ("W2A16", "w2a16"),
        ("W8A16", "w8a16"),
        ("W8A8", "w8a8"),
        ("W4A8", "w4a8"),
        ("FP8_STATIC", "fp8"),
        ("MXFP4", "mxfp4_g32"),
        ("NVFP4", "mxfp4_g16"),
    ])
    def test_kind_mapping(self, scheme, kind):
        assert _serving_kind(parse_scheme(scheme)) == kind

    def test_asym_kind(self):
        s = parse_scheme("W4A16", sym=False)
        assert _serving_kind(s) == "w4a16_asym"

    def test_w3_and_dq_ride_w4_kernels(self):
        # 3-bit and GGUF double-quant codes embed exactly in the 4-bit
        # kernels (sym: +8 store offset; asym: float zero point) — these
        # schemes must serve packed, not dense bf16
        assert _serving_kind(parse_scheme("W3A16")) == "w4a16"
        assert _serving_kind(
            parse_scheme("W3A16", sym=False)) == "w4a16_asym"
        assert _serving_kind(parse_scheme("GGUF:Q3_K_S")) == "w4a16"
        assert _serving_kind(parse_scheme("GGUF:Q4_K_S")) == "w4a16_asym"
        assert _serving_kind(parse_scheme("GGUF:Q2_K_S")) == "w4a16_asym"
        assert _serving_kind(
            parse_scheme("W2A16", sym=False)) == "w4a16_asym"

    def test_small_groups_serve_weight_only(self):
        # g in [16, 128) rides the W4 layout weight-only (the int8-MXU
        # dynamic-act kernel still needs g >= 128)
        assert _serving_kind(parse_scheme("W4A16G32")) == "w4a16"
        assert _serving_kind(parse_scheme("W4A8", group_size=32)) == "w4a16"
        assert _serving_kind(parse_scheme("W4A8")) == "w4a8"
        assert _serving_kind(
            parse_scheme("W2A16G64", sym=False)) == "w4a16_asym"

    def test_no_kind_for_unsupported(self):
        assert _serving_kind(parse_scheme("FP8_BLOCK")) is None


SCHEMES = [
    (parse_scheme("W4A16", sym=False), "w4a16_asym", 0.06),
    ("W2A16", "w2a16", 0.5),          # 2-bit RTN damage is large; the
                                       # packed path must still MATCH qdq
    ("W8A16", "w8a16", 0.02),
    ("FP8_STATIC", "fp8", 0.02),
    ("MXFP4", "mxfp4_g32", 0.06),
    ("NVFP4", "mxfp4_g16", 0.06),
    ("W3A16", "w4a16", 0.2),           # 3-bit riding the W4 kernel
    (parse_scheme("W3A16", sym=False), "w4a16_asym", 0.2),
    ("GGUF:Q4_K_S", "w4a16_asym", 0.06),   # dq flattened into the
    ("GGUF:Q3_K_S", "w4a16", 0.2),          # effective per-group
    ("GGUF:Q2_K_S", "w4a16_asym", 0.5),     # scale / float-zp payload
    ("W4A16G32", "w4a16", 0.06),            # small-group weight-only
]


def _sid(entry):
    s, k, _ = entry
    return s if isinstance(s, str) else f"asym-{k}"


IDS = [_sid(e) for e in SCHEMES]


class TestEngineExt:
    @pytest.mark.parametrize("scheme,kind,_", SCHEMES, ids=IDS)
    def test_packs_with_kind(self, cfg_params, scheme, kind, _):
        cfg, params = cfg_params
        res = _quantize(cfg, params, scheme)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        base = {k: v for k, v in eng.packed_kinds.items()
                if not k.endswith(("qkv", "gate_up"))}
        assert base, "nothing packed"
        assert set(base.values()) == {kind}
        fused = {k: v for k, v in eng.packed_kinds.items()
                 if k.endswith(("qkv", "gate_up"))}
        assert fused and set(fused.values()) == {kind}

    @pytest.mark.parametrize("scheme,kind,tol", SCHEMES, ids=IDS)
    def test_prefill_matches_qdq_model(self, cfg_params, scheme, kind, tol):
        """Packed serving must reproduce the dense qdq model — the packed
        codes/scales decode to exactly the tuned grid."""
        cfg, params = cfg_params
        res = _quantize(cfg, params, scheme)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        ids = jax.random.randint(jax.random.PRNGKey(5), (2, 12), 0, 128)
        logits, cache = eng.prefill(ids)
        ref = llama.model_fwd(res.params, ids, cfg)[:, -1]
        rms = float(jnp.sqrt(jnp.mean((logits - ref) ** 2))
                    / jnp.sqrt(jnp.mean(ref ** 2)))
        # packed-vs-qdq should be near-exact regardless of quant damage
        assert rms < 5e-3, f"{scheme}: packed diverges from qdq ({rms})"

    def test_w2_generate_scan(self, cfg_params):
        cfg, params = cfg_params
        res = _quantize(cfg, params, "W2A16")
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        ids = jax.random.randint(jax.random.PRNGKey(6), (2, 8), 0, 128)
        toks = eng.generate_scan(ids, max_new_tokens=4)
        assert toks.shape == (2, 4)
