"""E2E regression floors (model of the reference e2e tier,
``test/e2e/test_cpu/test_llm_quantize_accuracy.py`` ACC_FLOORS): a
scheme-matrix run with loose bounds on quantized-vs-FP logit damage, to
catch catastrophic regressions rather than variance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama

CFG = llama.CONFIG_PRESETS["tiny"]


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (16, 32), 0,
                             CFG.vocab_size)
    fp = np.asarray(llama.model_fwd(params, ids[:8], CFG), np.float32)
    return params, ids, fp


def rel_damage(res, ids, fp):
    q = np.asarray(llama.model_fwd(res.params, ids[:8], CFG), np.float32)
    return float(np.sqrt(np.mean((q - fp) ** 2)) / np.std(fp))


# (scheme, iters, loose ceiling on relative logit RMS damage)
MATRIX = [
    ("W8A16", 0, 0.05),
    ("W4A16G32", 0, 0.30),
    ("W4A16G32", 10, 0.30),
    ("W2A16G64", 15, 0.90),
    ("MXFP4", 0, 0.40),
    ("NVFP4", 0, 0.40),
    ("FP8_STATIC", 0, 0.15),
    ("GGUF:Q4_K_S", 0, 0.35),
]


class TestFloors:
    @pytest.mark.parametrize("scheme,iters,ceiling", MATRIX)
    def test_damage_within_floor(self, setup, scheme, iters, ceiling):
        params, ids, fp = setup
        if scheme.startswith("GGUF") and CFG.hidden_size % 128 != 0:
            # tiny hidden=64: use compatible sub-config for k-quants
            import dataclasses
            cfg2 = dataclasses.replace(CFG, hidden_size=256,
                                       intermediate_size=512, num_heads=4,
                                       num_kv_heads=2)
            params2 = llama.init_params(cfg2, jax.random.PRNGKey(0))
            ids2 = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                      cfg2.vocab_size)
            res = AutoRound((params2, cfg2), scheme=scheme,
                            iters=iters, batch_size=4).quantize(ids2)
            fp2 = np.asarray(llama.model_fwd(params2, ids2[:4], cfg2),
                             np.float32)
            q = np.asarray(llama.model_fwd(res.params, ids2[:4], cfg2),
                           np.float32)
            d = float(np.sqrt(np.mean((q - fp2) ** 2)) / np.std(fp2))
        else:
            res = AutoRound((params, CFG), scheme=scheme, iters=iters,
                            batch_size=4).quantize(ids)
            d = rel_damage(res, ids, fp)
        assert d <= ceiling, f"{scheme} iters={iters}: damage {d:.3f}"

    def test_bit_ordering(self, setup):
        params, ids, fp = setup
        damages = {}
        for scheme in ("W8A16", "W4A16G32", "W2A16G64"):
            res = AutoRound((params, CFG), scheme=scheme,
                            iters=0).quantize(ids)
            damages[scheme] = rel_damage(res, ids, fp)
        assert damages["W8A16"] < damages["W4A16G32"] < damages["W2A16G64"]
