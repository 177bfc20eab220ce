"""Qwen3.5-MoE family: Qwen3-Next hybrid + FUSED expert checkpoint
stacks (ref ``modeling/fused_moe/qwen3_5_moe.py`` —
``SequentialQwen3_5MoeExperts`` splits (E, 2I, H) ``gate_up_proj`` /
(E, H, I) ``down_proj`` into per-expert linears) and the ``mtp.*``
draft namespace (skipped on load).

transformers in-container (<5.2) does not ship the model; the loader is
pinned by layout equivalence: a fused-stack checkpoint must load to the
SAME pytree as the per-expert-key layout the Qwen3-Next path already
parity-locks.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
from safetensors.numpy import save_file

from autoround_tpu import AutoRound
from autoround_tpu.models import qwen3next
from autoround_tpu.models.qwen3next import Qwen35MoeConfig
from autoround_tpu.utils.hf_loader import load_hf_checkpoint

CFG = qwen3next.CONFIG_PRESETS["tiny-qwen35moe"]


def _cfg_json():
    return {
        "model_type": "qwen3_5_moe", "vocab_size": CFG.vocab_size,
        "hidden_size": CFG.hidden_size,
        "intermediate_size": CFG.intermediate_size,
        "moe_intermediate_size": CFG.moe_intermediate_size,
        "num_hidden_layers": CFG.num_layers,
        "num_attention_heads": CFG.num_heads,
        "num_key_value_heads": CFG.num_kv_heads,
        "head_dim": CFG.hd, "rope_theta": CFG.rope_theta,
        "rms_norm_eps": CFG.rms_eps, "tie_word_embeddings": False,
        "partial_rotary_factor": CFG.partial_rotary_factor,
        "layer_types": list(CFG.layer_types),
        "linear_num_key_heads": CFG.linear_num_key_heads,
        "linear_num_value_heads": CFG.linear_num_value_heads,
        "linear_key_head_dim": CFG.linear_key_head_dim,
        "linear_value_head_dim": CFG.linear_value_head_dim,
        "linear_conv_kernel_dim": CFG.linear_conv_kernel_dim,
        "num_experts": CFG.num_experts,
        "num_experts_per_tok": CFG.top_k,
        "shared_expert_intermediate_size":
            CFG.shared_expert_intermediate,
        "norm_topk_prob": CFG.norm_topk_prob,
    }


def _write_ckpt(d, fused: bool):
    """Fabricate a Qwen3.5-layout checkpoint; ``fused`` toggles the
    expert stack layout; adds an mtp.* draft tensor that must be
    skipped."""
    rng = np.random.default_rng(0)
    params = qwen3next.init_params(CFG, jax.random.PRNGKey(0))
    t = {
        "model.embed_tokens.weight": np.asarray(params["embed_tokens"]),
        "model.norm.weight": np.asarray(params["norm"]),
        "lm_head.weight": np.asarray(params["lm_head"]),
        # draft head namespace — must be ignored by the loader
        "mtp.layers.0.mlp.gate_proj.weight":
            rng.normal(size=(8, 8)).astype(np.float32),
    }
    for li, b in enumerate(params["blocks"]):
        p = f"model.layers.{li}."
        t[p + "input_layernorm.weight"] = np.asarray(b["input_layernorm"])
        t[p + "post_attention_layernorm.weight"] = np.asarray(
            b["post_attention_layernorm"])
        if "in_proj_qkvz" in b:
            t[p + "linear_attn.in_proj_qkvz.weight"] = np.asarray(
                b["in_proj_qkvz"])
            t[p + "linear_attn.in_proj_ba.weight"] = np.asarray(
                b["in_proj_ba"])
            t[p + "linear_attn.conv1d.weight"] = np.asarray(
                b["conv1d"])[:, None, :]
            t[p + "linear_attn.dt_bias"] = np.asarray(b["dt_bias"])
            t[p + "linear_attn.A_log"] = np.asarray(b["A_log"])
            t[p + "linear_attn.norm.weight"] = np.asarray(b["linear_norm"])
            t[p + "linear_attn.out_proj.weight"] = np.asarray(b["out_proj"])
        else:
            for hf, ours in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                             ("v_proj", "v_proj"), ("o_proj", "o_proj")):
                t[p + f"self_attn.{hf}.weight"] = np.asarray(b[ours])
            t[p + "self_attn.q_norm.weight"] = np.asarray(b["q_norm"])
            t[p + "self_attn.k_norm.weight"] = np.asarray(b["k_norm"])
        t[p + "mlp.gate.weight"] = np.asarray(b["router"])
        inv = {"w1": "gate_proj", "w3": "up_proj", "w2": "down_proj"}
        if fused:
            t[p + "mlp.experts.gate_up_proj"] = np.stack(
                [np.concatenate([np.asarray(e["w1"]), np.asarray(e["w3"])])
                 for e in b["experts"]])
            t[p + "mlp.experts.down_proj"] = np.stack(
                [np.asarray(e["w2"]) for e in b["experts"]])
        else:
            for ei, e in enumerate(b["experts"]):
                for wn, hf in inv.items():
                    t[p + f"mlp.experts.{ei}.{hf}.weight"] = np.asarray(
                        e[wn])
        for wn, hf in inv.items():
            t[p + f"mlp.shared_expert.{hf}.weight"] = np.asarray(
                b["shared_expert"][wn])
        t[p + "mlp.shared_expert_gate.weight"] = np.asarray(
            b["shared_expert_gate"])
    d.mkdir()
    save_file(t, str(d / "model.safetensors"))
    json.dump(_cfg_json(), open(d / "config.json", "w"))
    return str(d)


class TestQwen35MoeLoader:
    def test_fused_layout_matches_per_expert(self, tmp_path):
        p_f = _write_ckpt(tmp_path / "fused", fused=True)
        p_u = _write_ckpt(tmp_path / "unfused", fused=False)
        lf, cf = load_hf_checkpoint(p_f, dtype=jnp.float32)
        lu, cu = load_hf_checkpoint(p_u, dtype=jnp.float32)
        assert isinstance(cf, Qwen35MoeConfig)
        for li in range(CFG.num_layers):
            for ei in range(CFG.num_experts):
                for wn in ("w1", "w2", "w3"):
                    np.testing.assert_array_equal(
                        np.asarray(lf["blocks"][li]["experts"][ei][wn]),
                        np.asarray(lu["blocks"][li]["experts"][ei][wn]))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0,
                                 CFG.vocab_size)
        yf = qwen3next.model_fwd(lf, ids, cf)
        yu = qwen3next.model_fwd(lu, ids, cu)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yu),
                                   rtol=1e-6, atol=1e-6)
        # the mtp.* draft tensor was skipped, not mapped anywhere
        assert "mtp" not in str(jax.tree_util.tree_structure(lf))

    def test_quantize_and_serve(self, tmp_path):
        from autoround_tpu.serve import QuantizedLlama
        path = _write_ckpt(tmp_path / "fused", fused=True)
        params, cfg = load_hf_checkpoint(path, dtype=jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        assert "blocks.0.experts.0.w1" in res.layers
        assert "blocks.1.q_proj" in res.layers
        # Qwen35MoeConfig rides the Qwen3-Next hybrid serving path
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        out = eng.generate(ids[:2, :8], max_new_tokens=4)
        assert out.shape == (2, 4)
