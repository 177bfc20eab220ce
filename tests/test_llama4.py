"""Llama-4: interleaved rope/NoPE layers, chunked attention, L2 q/k norm,
temperature-tuned NoPE queries, input-scaled MoE — logit parity vs
transformers and end-to-end quantization with per-layer forward
variants in the tuning chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama4
from autoround_tpu.utils.hf_loader import load_hf_checkpoint


class TestLogitParity:
    def test_parity_vs_transformers(self, tmp_path):
        import torch
        from transformers import Llama4ForCausalLM, Llama4TextConfig
        torch.manual_seed(0)
        hf_cfg = Llama4TextConfig(
            vocab_size=256, hidden_size=64, intermediate_size=64,
            intermediate_size_mlp=128, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            num_local_experts=4, num_experts_per_tok=2,
            interleave_moe_layer_step=2, no_rope_layers=[1, 1, 1, 0],
            attention_chunk_size=8, attn_temperature_tuning=True,
            floor_scale=4.0, attn_scale=0.1, use_qk_norm=True,
            rope_scaling=None, attn_implementation="eager")
        model = Llama4ForCausalLM(hf_cfg).float().eval()
        model.save_pretrained(str(tmp_path), safe_serialization=True)
        params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
        assert isinstance(cfg, llama4.Llama4Config)
        assert cfg.no_rope_layers == (1, 1, 1, 0)
        assert cfg.chunked_attention and cfg.sliding_window == 8
        assert cfg.moe_layers == (1, 3)
        # dense layers carry plain MLPs, MoE layers expert lists
        assert "experts" not in params["blocks"][0]
        assert "experts" in params["blocks"][1]
        assert params["blocks"][0]["gate_proj"].shape == (128, 64)
        assert params["blocks"][1]["experts"][0]["gate_proj"].shape == \
            (64, 64)
        # S=12 > chunk=8 exercises chunked attention; layer 3 is NoPE
        # with temperature tuning (floor_scale=4 < S kicks the scale in)
        ids = np.random.default_rng(0).integers(0, 256, (2, 12))
        ours = np.asarray(
            llama4.model_fwd(params, jnp.asarray(ids), cfg), np.float32)
        import torch as _t
        with _t.no_grad():
            want = model(_t.tensor(ids, dtype=_t.long)
                         ).logits.float().numpy()
        np.testing.assert_allclose(ours, want, rtol=3e-2, atol=3e-2)


class TestQuantize:
    def test_quantize_tiny_llama4(self):
        cfg = llama4.CONFIG_PRESETS["tiny-llama4"]
        params = llama4.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=2,
                        batch_size=4).quantize(ids)
        # dense layer 1 tunes its wide MLP; MoE layer 0 its experts
        assert "blocks.1.gate_proj" in res.layers
        assert "blocks.0.experts.0.gate_proj" in res.layers
        assert "blocks.0.shared_expert.down_proj" in res.layers
        assert not any(k.startswith("blocks.1.experts") for k in res.layers)
        ours = llama4.model_fwd(res.params, ids[:1], cfg)
        ref = llama4.model_fwd(params, ids[:1], cfg)
        rms = float(jnp.sqrt(jnp.mean(
            (ours.astype(jnp.float32) - ref.astype(jnp.float32)) ** 2)))
        scale = float(jnp.sqrt(jnp.mean(ref.astype(jnp.float32) ** 2)))
        assert rms < 0.5 * scale

    def test_block_fwd_for_variants(self):
        """block_fwd_for must return the NoPE forward for no_rope layers
        (the tuning chain's FP reference depends on it) and stable
        callable identities per kind."""
        from autoround_tpu.models import llama
        cfg = llama4.CONFIG_PRESETS["tiny-llama4"]
        params = llama4.init_params(cfg, jax.random.PRNGKey(2))
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 64),
                              jnp.float32)
        cos, sin = llama.rope_tables(cfg, 12)
        # layer 3 is NoPE: its variant must equal use_rope=False and
        # differ from the rope forward
        bf3 = llama4.block_fwd_for(cfg, 3)
        w3 = params["blocks"][3]
        y = bf3(w3, x, cos, sin, cfg)
        want = llama4.block_fwd(w3, x, cos, sin, cfg, use_rope=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
        rope_y = llama4.block_fwd(w3, x, cos, sin, cfg, use_rope=True)
        assert not np.allclose(np.asarray(y), np.asarray(rope_y),
                               rtol=1e-3, atol=1e-3)
        # stable identities: one callable per kind
        assert llama4.block_fwd_for(cfg, 0) is llama4.block_fwd_for(cfg, 1)
        assert llama4.block_fwd_for(cfg, 3) is not \
            llama4.block_fwd_for(cfg, 0)


class TestServing:
    @pytest.fixture(scope="class")
    def quantized(self):
        cfg = llama4.CONFIG_PRESETS["tiny-llama4"]
        params = llama4.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        return cfg, res

    @pytest.mark.parametrize("kv_quant", [None, "int8"])
    def test_prefill_decode_match_model_fwd(self, quantized, kv_quant):
        from autoround_tpu.serve import QuantizedLlama
        cfg, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32,
                                                  kv_quant=kv_quant)
        # S=12 > chunk=8; layer 3 NoPE with temperature scaling
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, 256)
        logits, cache = eng.prefill(ids)
        want = llama4.model_fwd(res.params, ids, cfg)[:, -1]
        tol = 5e-2 if kv_quant is None else 2e-1
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=tol, atol=tol)
        # decode crosses a chunk boundary (pos 12..15 vs chunk 8)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        seq = ids
        for _ in range(3):
            logits, cache = eng.decode_step(tok, cache)
            seq = jnp.concatenate([seq, tok[:, None]], axis=1)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        want2 = llama4.model_fwd(res.params, seq, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want2, np.float32),
                                   rtol=tol, atol=tol)

    def test_continuous_batching(self, quantized):
        from autoround_tpu.serve import QuantizedLlama
        from autoround_tpu.serve.batching import ContinuousBatchingEngine
        cfg, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        cb = ContinuousBatchingEngine(eng, max_batch=2, max_seq=64,
                                      prompt_buckets=(16,))
        prompts = [[3, 5, 7, 2, 9, 11, 1, 8, 6, 4], [12, 4, 9]]
        rids = [cb.submit(p, max_new_tokens=4) for p in prompts]
        while cb.pending():
            cb.step()
        for p, rid in zip(prompts, rids):
            want = np.asarray(eng.generate(
                jnp.asarray([p], jnp.int32), max_new_tokens=4))[0]
            np.testing.assert_array_equal(np.asarray(cb.result(rid)), want)


class TestGroupedExpertServing:
    """Llama4 experts stack into the grouped MoE kernel payload; the
    input-scaled router rides both the dense-grouped and capacity
    (scale_input=True) dispatch paths."""

    @pytest.fixture(scope="class")
    def engine(self):
        from autoround_tpu.serve import QuantizedLlama
        # kernel-sized dims (K % 1024 == 0, O % 256 == 0): the tiny
        # preset's 64-wide layers fall below the packing constraints
        cfg = llama4.Llama4Config(
            vocab_size=128, hidden_size=1024, intermediate_size=1024,
            intermediate_size_mlp=1024, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=64, rope_theta=1e4,
            num_experts=4, top_k=2, moe_layers=(0,),
            no_rope_layers=(1, 0), sliding_window=8,
            layer_types=("sliding_attention", "full_attention"),
            dtype=jnp.float32)
        params = llama4.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        return cfg, res, eng

    def test_experts_stacked(self, engine):
        cfg, res, eng = engine
        stacked = sorted(k for k in eng.packed if "experts_stack" in k)
        # 1 MoE block x gate/up/down; the dense block stays unstacked
        assert len(stacked) == 3
        assert not any(".experts." in k for k in eng.packed)

    def test_grouped_parity(self, engine):
        cfg, res, eng = engine
        ids = jax.random.randint(jax.random.PRNGKey(5), (2, 12), 0,
                                  cfg.vocab_size)
        logits, _ = eng.prefill(ids)
        want = llama4.model_fwd(res.params, ids, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)

    def test_capacity_dispatch(self, engine, monkeypatch):
        from autoround_tpu import envs
        cfg, res, eng = engine
        monkeypatch.setattr(envs, "AR_MOE_CAPACITY_FACTOR", 4.0)
        ids = jax.random.randint(jax.random.PRNGKey(6), (2, 12), 0,
                                  cfg.vocab_size)
        # fresh jit cache: capacity factor is read at trace time
        logits, cache = jax.jit(eng._prefill_impl)(eng.params, eng.packed,
                                                   ids)
        want = llama4.model_fwd(res.params, ids, cfg)[:, -1]
        # generous capacity (4x) -> no drops on tiny batches
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)
