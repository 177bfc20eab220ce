"""Serving from an exported packed checkpoint (from_pretrained)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama
from autoround_tpu.serve import QuantizedLlama


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = llama.LlamaConfig(vocab_size=128, hidden_size=1024,
                            intermediate_size=1024, num_layers=2,
                            num_heads=4, num_kv_heads=2, rope_theta=1e4,
                            dtype=jnp.float32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    ar = AutoRound((params, cfg), scheme="W4A16", iters=0)
    res = ar.quantize(ids)
    out = ar.save_quantized(
        str(tmp_path_factory.mktemp("ckpt") / "m"), format="autoround")
    return out, cfg, res, ids


class TestFromPretrained:
    def test_loads_and_packs(self, exported):
        out, cfg, res, ids = exported
        eng = QuantizedLlama.from_pretrained(out, max_seq=64)
        assert eng.cfg.num_layers == cfg.num_layers
        base = [k for k in eng.packed
                if not k.endswith(("qkv", "gate_up"))]
        assert len(base) == cfg.num_layers * 7

    def test_logits_match_in_memory_engine(self, exported):
        out, cfg, res, ids = exported
        disk = QuantizedLlama.from_pretrained(out, max_seq=64)
        mem = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        l0, _ = mem.prefill(ids[:1, :8])
        l1, _ = disk.prefill(ids[:1, :8])
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=5e-2, atol=5e-2)

    def test_generate_from_disk(self, exported):
        out, cfg, res, ids = exported
        eng = QuantizedLlama.from_pretrained(out, max_seq=64)
        toks = eng.generate(ids[:1, :4], max_new_tokens=5)
        assert toks.shape == (1, 5)
