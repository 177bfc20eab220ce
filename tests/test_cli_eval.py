"""CLI + eval tests (run the real CLI main in-process on a tiny model)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.cli import RECIPES, build_parser, main
from autoround_tpu.eval import lm_nll, perplexity
from autoround_tpu.models import llama


class TestEval:
    def test_ppl_finite_and_ordering(self):
        cfg = llama.CONFIG_PRESETS["tiny"]
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 cfg.vocab_size)
        p = perplexity(params, cfg, ids)
        assert np.isfinite(p) and p > 1
        # random model on random tokens ≈ uniform → ppl near vocab_size
        assert p < cfg.vocab_size * 2

    def test_mask_excludes_positions(self):
        cfg = llama.CONFIG_PRESETS["tiny"]
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        full = lm_nll(params, cfg, ids)
        half_mask = jnp.ones((4, 16)).at[:, 8:].set(0)
        half = lm_nll(params, cfg, ids, mask=half_mask)
        assert abs(full - half) > 1e-6  # mask actually changes the estimate


class TestCli:
    def test_recipes_match_reference_surface(self):
        assert RECIPES["default"]["iters"] == 200
        assert RECIPES["best"]["iters"] == 1000
        assert RECIPES["light"]["lr"] == 5e-3
        assert RECIPES["rtn"]["iters"] == 0

    def test_parser_defaults(self):
        args = build_parser().parse_args(["--model", "tiny"])
        assert args.scheme == "W4A16" and args.recipe == "default"

    def test_cli_end_to_end_rtn(self, tmp_path):
        out = tmp_path / "out"
        rc = main(["--model", "tiny", "--recipe", "rtn",
                   "--scheme", "W4A16",
                   "--dataset", "synthetic",
                   "--nsamples", "4", "--seqlen", "16",
                   "--output", str(out), "--eval-ppl"])
        assert rc == 0
        assert (out / "model.safetensors").exists()
        assert (out / "quantization_config.json").exists()

    def test_cli_tuned_with_autoscheme(self, tmp_path):
        out = tmp_path / "out2"
        rc = main(["--model", "tiny", "--recipe", "light",
                   "--iters", "2", "--nsamples", "4", "--seqlen", "16",
                   "--batch-size", "2",
                   "--avg-bits", "3.0",
                   "--scheme-options", "W2A16", "W4A16G32",
                   "--dataset", "synthetic", "--output", str(out)])
        assert rc == 0
        cfgf = json.load(open(out / "quantization_config.json"))
        bits = {v["bits"] for v in cfgf["layers"].values()}
        assert bits == {2, 4}
