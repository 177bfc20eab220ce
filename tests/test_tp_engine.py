"""Mesh-parallel serving engine (tp + dp shard_map decode loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama
from autoround_tpu.parallel.mesh import make_mesh
from autoround_tpu.serve import QuantizedLlama, TPQuantizedLlama


@pytest.fixture(scope="module")
def single_chip():
    cfg = llama.LlamaConfig(vocab_size=128, hidden_size=1024,
                            intermediate_size=1024, num_layers=2,
                            num_heads=4, num_kv_heads=2, rope_theta=1e4,
                            dtype=jnp.float32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
    eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
    return eng, cfg, ids


class TestTPEngine:
    def test_prefill_matches_single_chip(self, single_chip):
        eng, cfg, ids = single_chip
        mesh = make_mesh(8, dp=4, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        l0, c0 = eng.prefill(ids)
        l1, c1 = tpe.prefill(ids)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=2e-2, atol=2e-2)
        assert c1.k.shape == c0.k.shape  # global logical shape preserved

    def test_generate_matches_single_chip(self, single_chip):
        eng, cfg, ids = single_chip
        mesh = make_mesh(8, dp=4, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        t0 = np.asarray(eng.generate(ids, max_new_tokens=6))
        t1 = np.asarray(tpe.generate(ids, max_new_tokens=6))
        # greedy argmax can flip on ties under reordered psum summation;
        # require near-total agreement
        assert (t0 == t1).mean() >= 0.9

    def test_tp_only_mesh(self, single_chip):
        eng, cfg, ids = single_chip
        mesh = make_mesh(2, dp=1, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        l0, _ = eng.prefill(ids[:1, :8])
        l1, _ = tpe.prefill(ids[:1, :8])
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_kv_quant_int8(self, single_chip):
        eng, cfg, ids = single_chip
        qeng = QuantizedLlama(cfg=eng.cfg, params=eng.params,
                              packed=eng.packed, max_seq=64,
                              kv_quant="int8",
                              fused_splits=eng.fused_splits)
        mesh = make_mesh(4, dp=2, tp=2)
        tpe = TPQuantizedLlama.from_engine(qeng, mesh)
        logits, cache = tpe.prefill(ids[:2, :8])
        assert cache.k.dtype == jnp.int8
        logits2, cache = tpe.decode_step(
            jnp.argmax(logits, -1).astype(jnp.int32), cache)
        assert logits2.shape == (2, cfg.vocab_size)

    def test_batch_divisibility_assert(self, single_chip):
        eng, cfg, ids = single_chip
        mesh = make_mesh(8, dp=4, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        with pytest.raises(AssertionError):
            tpe.prefill(ids[:3, :8])

    def test_row_repack_chunks_are_valid_packings(self):
        """Per-shard repack: dim-1 chunk d of the resharded qweight must
        unpack to the K-chunk d of the original codes."""
        from autoround_tpu.ops.qmatmul import (pack_w4_planes,
                                               unpack_w4_planes)
        from autoround_tpu.serve.tp_engine import _reshard_row_layers

        g, O, K, tp = 128, 8, 4096, 2
        codes = jax.random.randint(jax.random.PRNGKey(0), (O, K), 0, 16)
        scales = jnp.ones((O, K // g))
        packed = {"blocks.0.o_proj": (pack_w4_planes(codes, g), scales)}
        packed, _ = _reshard_row_layers(
            packed, {"blocks": [{}]}, None, tp)
        qw2, _ = packed["blocks.0.o_proj"]
        for d in range(tp):
            chunk = qw2[:, d * qw2.shape[1] // tp:(d + 1) * qw2.shape[1] // tp]
            np.testing.assert_array_equal(
                np.asarray(unpack_w4_planes(chunk, g)),
                np.asarray(codes[:, d * K // tp:(d + 1) * K // tp]))

    def test_row_repack_pads_nondivisible_chunks(self):
        """Per-shard K that is not a whole tile (e.g. 8B down_proj
        14336/4 = 3.5 tiles) pads to the next tile with zero-dequant
        codes instead of falling back to dense."""
        from autoround_tpu.ops.qmatmul import (pack_w4_planes,
                                               unpack_w4_planes)
        from autoround_tpu.serve.tp_engine import _reshard_row_layers

        g, O, K, tp = 128, 8, 3072, 4   # local K = 768 = 1.5 tiles
        codes = jax.random.randint(jax.random.PRNGKey(0), (O, K), 0, 16)
        scales = jnp.ones((O, K // g))
        packed = {"blocks.0.down_proj": (pack_w4_planes(codes, g), scales)}
        packed, _ = _reshard_row_layers(packed, {"blocks": [{}]}, None, tp)
        qw2, s2 = packed["blocks.0.down_proj"]
        Kp = 1024                        # padded per-shard K
        assert qw2.shape == (O, tp * Kp // 8)
        assert s2.shape == (O, tp * Kp // g)
        for d in range(tp):
            chunk = qw2[:, d * Kp // 8:(d + 1) * Kp // 8]
            un = np.asarray(unpack_w4_planes(chunk, g))
            np.testing.assert_array_equal(
                un[:, :K // tp],
                np.asarray(codes[:, d * K // tp:(d + 1) * K // tp]))
            assert (un[:, K // tp:] == 8).all()  # zero-dequant padding

    def test_padded_row_path_parity(self):
        """tp=4 over hidden=1024: per-shard row K = 256 (2 groups) pads
        to one tile; logits must still match the single-chip engine."""
        cfg = llama.LlamaConfig(vocab_size=64, hidden_size=1024,
                                intermediate_size=1024, num_layers=1,
                                num_heads=4, num_kv_heads=4,
                                rope_theta=1e4, dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        mesh = make_mesh(4, dp=1, tp=4)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        assert "blocks.0.o_proj" in tpe.packed
        assert "blocks.0.down_proj" in tpe.packed
        l0, _ = eng.prefill(ids)
        l1, _ = tpe.prefill(ids)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_packed_row_path_end_to_end(self):
        """hidden=2048 keeps o/down packed under tp=2 (local K = 8g)."""
        cfg = llama.LlamaConfig(vocab_size=64, hidden_size=2048,
                                intermediate_size=2048, num_layers=1,
                                num_heads=4, num_kv_heads=2, rope_theta=1e4,
                                dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        mesh = make_mesh(2, dp=1, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        # row layers must have stayed packed (no dense fallback)
        assert "blocks.0.o_proj" in tpe.packed
        assert "blocks.0.down_proj" in tpe.packed
        l0, _ = eng.prefill(ids)
        l1, _ = tpe.prefill(ids)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=2e-2, atol=2e-2)


class TestExpertParallel:
    @pytest.fixture(scope="class")
    def moe_engine(self):
        from autoround_tpu.models import mixtral
        cfg = mixtral.MixtralConfig(
            vocab_size=128, hidden_size=1024, intermediate_size=1024,
            num_layers=1, num_heads=4, num_kv_heads=2, num_experts=4,
            top_k=2, rope_theta=1e4, dtype=jnp.float32)
        params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 128)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        assert any("experts_stack" in k for k in eng.packed)
        return eng, cfg, ids

    def test_experts_shard_across_tp(self, moe_engine):
        """Expert parallelism: the stacked (E, O, Kw) payload shards on E
        (2 experts per device at tp=2) and the routed output psums."""
        eng, cfg, ids = moe_engine
        mesh = make_mesh(4, dp=2, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        skey = next(k for k in tpe.packed if "experts_stack" in k)
        shard = tpe.packed[skey][0].sharding
        assert shard.spec[0] == "tp"  # expert dim sharded
        l0, c0 = eng.prefill(ids)
        l1, c1 = tpe.prefill(ids)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=2e-2, atol=2e-2)
        tok = jnp.argmax(l0, -1).astype(jnp.int32)
        d0, _ = eng.decode_step(tok, c0)
        d1, _ = tpe.decode_step(tok, c1)
        np.testing.assert_allclose(np.asarray(d1, np.float32),
                                   np.asarray(d0, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_ep_with_capacity_dispatch(self, moe_engine, monkeypatch):
        from autoround_tpu import envs
        eng, cfg, ids = moe_engine
        monkeypatch.setattr(envs, "AR_MOE_CAPACITY_FACTOR", 4.0)
        mesh = make_mesh(4, dp=2, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        l0, c0 = eng.prefill(ids)
        tok = jnp.argmax(l0, -1).astype(jnp.int32)
        d0, _ = eng.decode_step(tok, c0)
        l1, c1 = tpe.prefill(ids)
        d1, _ = tpe.decode_step(tok, c1)
        np.testing.assert_allclose(np.asarray(d1, np.float32),
                                   np.asarray(d0, np.float32),
                                   rtol=2e-2, atol=2e-2)


class TestVocabShardedHead:
    def test_packed_lm_head_shards_on_vocab(self):
        cfg = llama.LlamaConfig(vocab_size=256, hidden_size=1024,
                                intermediate_size=1024, num_layers=1,
                                num_heads=4, num_kv_heads=2, rope_theta=1e4,
                                dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 256)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0,
                        quant_lm_head=True).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        assert "lm_head" in eng.packed
        mesh = make_mesh(4, dp=2, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        assert tpe.packed["lm_head"][0].sharding.spec[0] == "tp"
        l0, c0 = eng.prefill(ids)
        l1, c1 = tpe.prefill(ids)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=2e-2, atol=2e-2)
        tok = jnp.argmax(l0, -1).astype(jnp.int32)
        d0, _ = eng.decode_step(tok, c0)
        d1, _ = tpe.decode_step(tok, c1)
        np.testing.assert_allclose(np.asarray(d1, np.float32),
                                   np.asarray(d0, np.float32),
                                   rtol=2e-2, atol=2e-2)


class TestDistributedHead:
    """Decode steps that return TOKENS, not logits: shards exchange
    per-shard winners/candidates instead of (B, V/tp) logit shards."""

    @pytest.fixture(scope="class")
    def head_engines(self):
        cfg = llama.LlamaConfig(vocab_size=256, hidden_size=1024,
                                intermediate_size=1024, num_layers=1,
                                num_heads=4, num_kv_heads=2,
                                rope_theta=1e4, dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 256)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0,
                        quant_lm_head=True).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        assert "lm_head" in eng.packed
        mesh = make_mesh(4, dp=2, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        return eng, tpe, ids

    def test_greedy_tokens_identical(self, head_engines):
        eng, tpe, ids = head_engines
        l0, c0 = eng.prefill(ids)
        _, c1 = tpe.prefill(ids)
        tok = jnp.argmax(l0, -1).astype(jnp.int32)
        d0, _ = eng.decode_step(tok, c0)
        want = np.asarray(jnp.argmax(d0, -1).astype(jnp.int32))
        got, _ = tpe.decode_sample_step(tok, c1)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_generate_uses_distributed_head(self, head_engines):
        eng, tpe, ids = head_engines
        t0 = np.asarray(eng.generate(ids, max_new_tokens=5))
        t1 = np.asarray(tpe.generate(ids, max_new_tokens=5))
        assert (t0 == t1).mean() >= 0.9

    def test_sampled_tokens_within_single_chip_nucleus(self, head_engines):
        from autoround_tpu.serve.sampling import SamplingParams
        eng, tpe, ids = head_engines
        sp = SamplingParams(temperature=0.8, top_k=8, top_p=0.95, seed=3)
        l0, c0 = eng.prefill(ids)
        _, c1 = tpe.prefill(ids)
        tok = jnp.argmax(l0, -1).astype(jnp.int32)
        d0, _ = eng.decode_step(tok, c0)
        got, _ = tpe.decode_sample_step(tok, c1, jax.random.PRNGKey(9), sp)
        got = np.asarray(got)
        # distributed sampling draws from exactly the single-chip
        # top-k∩top-p candidate set (realization may differ — the
        # categorical runs over the candidate subset)
        x = np.asarray(d0, np.float32) / sp.temperature
        for b in range(x.shape[0]):
            order = np.argsort(-x[b])
            keep = order[:sp.top_k]
            probs = np.exp(x[b][keep] - x[b][keep].max())
            probs /= probs.sum()
            cum = np.cumsum(probs) - probs
            nucleus = set(keep[cum < sp.top_p].tolist())
            assert int(got[b]) in nucleus

    def test_sampled_deterministic_per_key(self, head_engines):
        from autoround_tpu.serve.sampling import SamplingParams
        eng, tpe, ids = head_engines
        sp = SamplingParams(temperature=0.8, top_k=8, seed=3)
        l0, _ = eng.prefill(ids)
        _, c1 = tpe.prefill(ids)
        tok = jnp.argmax(l0, -1).astype(jnp.int32)
        a, _ = tpe.decode_sample_step(tok, c1, jax.random.PRNGKey(5), sp)
        _, c1b = tpe.prefill(ids)
        b, _ = tpe.decode_sample_step(tok, c1b, jax.random.PRNGKey(5), sp)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMLATensorParallel:
    """DeepSeek MLA over the (dp, tp) mesh: query heads and kv_b shard
    per head, the compressed latent cache replicates over tp (MQA-like),
    o_proj is row-parallel, and MoE experts ride expert parallelism."""

    @pytest.fixture(scope="class")
    def mla_engine(self):
        from autoround_tpu.models import deepseek
        cfg = deepseek.DeepseekConfig(
            vocab_size=128, hidden_size=1024, intermediate_size=1024,
            num_layers=2, num_heads=4, num_kv_heads=4, rope_theta=1e4,
            q_lora_rank=0, kv_lora_rank=64, qk_nope_head_dim=64,
            qk_rope_head_dim=32, v_head_dim=64,
            n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=1024, n_shared_experts=1,
            first_k_dense=1, routed_scaling_factor=1.0,
            scoring_func="softmax", norm_topk_prob=False,
            dtype=jnp.float32)
        params = deepseek.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 128)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        return eng, cfg, ids

    def test_mla_prefill_decode_match_single_chip(self, mla_engine):
        eng, cfg, ids = mla_engine
        mesh = make_mesh(4, dp=2, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        l0, c0 = eng.prefill(ids)
        l1, c1 = tpe.prefill(ids)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=2e-2, atol=2e-2)
        # latent cache replicates over tp, shards batch over dp
        assert c1.k.shape == c0.k.shape
        tok = jnp.argmax(l0, -1).astype(jnp.int32)
        d0, _ = eng.decode_step(tok, c0)
        d1, _ = tpe.decode_step(tok, c1)
        np.testing.assert_allclose(np.asarray(d1, np.float32),
                                   np.asarray(d0, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_mla_generate_matches(self, mla_engine):
        eng, cfg, ids = mla_engine
        mesh = make_mesh(4, dp=2, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        t0 = np.asarray(eng.generate(ids, max_new_tokens=5))
        t1 = np.asarray(tpe.generate(ids, max_new_tokens=5))
        assert (t0 == t1).mean() >= 0.9

    def test_mla_kv_quant_int8(self, mla_engine):
        from autoround_tpu.serve import QuantizedLlama as QL
        eng, cfg, ids = mla_engine
        # rebuild single-chip engine with int8 latents, then shard it
        mesh = make_mesh(4, dp=2, tp=2)
        eng8 = QL(cfg=cfg, params=eng.params, packed=eng.packed,
                  max_seq=32, kv_quant="int8",
                  fused_splits=eng.fused_splits,
                  packed_kinds=eng.packed_kinds)
        tpe = TPQuantizedLlama.from_engine(eng8, mesh)
        l0, c0 = eng8.prefill(ids)
        l1, c1 = tpe.prefill(ids)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=5e-2, atol=5e-2)
        tok = jnp.argmax(l0, -1).astype(jnp.int32)
        d0, _ = eng8.decode_step(tok, c0)
        d1, _ = tpe.decode_step(tok, c1)
        np.testing.assert_allclose(np.asarray(d1, np.float32),
                                   np.asarray(d0, np.float32),
                                   rtol=5e-2, atol=5e-2)


class TestGptOssTensorParallel:
    """GPT-OSS over the mesh: sinks shard per head, biased experts ride
    expert parallelism (bias stacks slice to the local expert range)."""

    @pytest.fixture(scope="class")
    def oss_engine(self):
        from autoround_tpu.models import gptoss
        cfg = gptoss.GptOssConfig(
            vocab_size=128, hidden_size=1024, intermediate_size=1024,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
            rope_theta=1e4, attn_bias=True, sliding_window=8,
            num_experts=4, top_k=2, dtype=jnp.float32)
        params = gptoss.init_params(cfg, jax.random.PRNGKey(0))
        for b in params["blocks"]:
            b["sinks"] = jax.random.normal(jax.random.PRNGKey(7),
                                           (cfg.num_heads,), jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 128)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        assert any("experts_stack" in k for k in eng.packed)
        return eng, cfg, ids

    def test_gptoss_tp_matches_single_chip(self, oss_engine):
        eng, cfg, ids = oss_engine
        mesh = make_mesh(4, dp=2, tp=2)
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        l0, c0 = eng.prefill(ids)
        l1, c1 = tpe.prefill(ids)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=2e-2, atol=2e-2)
        tok = jnp.argmax(l0, -1).astype(jnp.int32)
        d0, _ = eng.decode_step(tok, c0)
        d1, _ = tpe.decode_step(tok, c1)
        np.testing.assert_allclose(np.asarray(d1, np.float32),
                                   np.asarray(d0, np.float32),
                                   rtol=2e-2, atol=2e-2)


class TestA8TensorParallel:
    """serve_a8 (byte-pair int8-MXU) engines shard over the mesh: column
    layers split on O, row layers split contiguously at 2g tiles (or
    pad with zero-dequant codes), and logits track the single-chip a8
    engine."""

    def test_a8_row_repack_and_parity(self):
        cfg = llama.LlamaConfig(vocab_size=64, hidden_size=1024,
                                intermediate_size=1024, num_layers=1,
                                num_heads=4, num_kv_heads=4,
                                rope_theta=1e4, dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32,
                                                  serve_a8=True)
        assert set(eng.packed_kinds.values()) == {"w4a8"}
        mesh = make_mesh(2, dp=1, tp=2)   # local K = 512 = 2 tiles
        tpe = TPQuantizedLlama.from_engine(eng, mesh)
        assert "blocks.0.down_proj" in tpe.packed   # stayed packed
        l0, _ = eng.prefill(ids)
        l1, _ = tpe.prefill(ids)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=3e-2, atol=3e-2)

    def test_a8_padded_row_chunks(self):
        """tp=4 over hidden 1024: per-shard K = 256 = exactly one 2g
        tile — and tp=4 over K=1536 pads 384→512 per shard."""
        from autoround_tpu.ops.qmatmul_int8 import (pack_w4_bytes,
                                                    unpack_w4_bytes)
        from autoround_tpu.serve.tp_engine import _reshard_row_layers
        g, O, K, tp = 128, 8, 1536, 4     # local K = 384 -> pad 512
        codes = jax.random.randint(jax.random.PRNGKey(0), (O, K), 0, 16)
        scales = jnp.ones((O, K // g))
        packed = {"blocks.0.down_proj": (pack_w4_bytes(codes), scales)}
        packed, _ = _reshard_row_layers(
            packed, {"blocks": [{}]},
            llama.LlamaConfig(vocab_size=8, hidden_size=64,
                              intermediate_size=64, num_layers=1,
                              num_heads=2, num_kv_heads=2,
                              rope_theta=1e4, dtype=jnp.float32),
            tp, kinds={"blocks.0.down_proj": "w4a8"})
        qw2, s2 = packed["blocks.0.down_proj"]
        Kp = 512
        assert qw2.shape == (O, tp * Kp // 2)
        for d in range(tp):
            chunk = qw2[:, d * Kp // 2:(d + 1) * Kp // 2]
            un = np.asarray(unpack_w4_bytes(chunk))
            np.testing.assert_array_equal(
                un[:, :K // tp],
                np.asarray(codes[:, d * K // tp:(d + 1) * K // tp]))
            assert (un[:, K // tp:] == 8).all()
