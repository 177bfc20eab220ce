"""Calibration data layer tests."""

import json

import numpy as np
import pytest

from autoround_tpu.quantize.calib_data import CALIB_DATASETS, get_calib_batch


class FakeTokenizer:
    def __call__(self, text):
        return {"input_ids": [ord(c) % 250 for c in text]}


class TestCalibData:
    def test_synthetic(self):
        ids, mask = get_calib_batch("synthetic", nsamples=8, seqlen=32,
                                    vocab_size=100)
        assert ids.shape == (8, 32) and ids.max() < 100
        assert mask.all()
        ids2, _ = get_calib_batch("synthetic", nsamples=8, seqlen=32,
                                  vocab_size=100)
        np.testing.assert_array_equal(ids, ids2)  # deterministic

    def test_raw_array(self):
        arr = np.arange(64).reshape(4, 16)
        ids, mask = get_calib_batch(arr)
        np.testing.assert_array_equal(ids, arr)

    def test_token_lists_padded_and_masked(self):
        data = [[1] * 20, [2] * 10]
        ids, mask = get_calib_batch(data, nsamples=2, seqlen=16)
        assert ids.shape == (2, 16)
        assert mask[0].sum() == 16 and mask[1].sum() == 10
        assert (ids[1, 10:] == 0).all()

    def test_local_file(self, tmp_path):
        p = tmp_path / "texts.jsonl"
        with open(p, "w") as f:
            for i in range(20):
                f.write(json.dumps({"text": "hello world " * 30}) + "\n")
        ids, mask = get_calib_batch(f"local:{p}", nsamples=4, seqlen=64,
                                    tokenizer=FakeTokenizer())
        assert ids.shape == (4, 64)
        assert mask.sum() > 0

    def test_unknown_dataset_raises(self):
        with pytest.raises(ValueError):
            get_calib_batch("not-a-dataset", nsamples=2, seqlen=8)

    def test_reference_dataset_names_registered(self):
        for name in ["pile-10k", "pile-val-backup", "synthetic", "local"]:
            assert name in CALIB_DATASETS

    def test_hub_dataset_unavailable_is_actionable(self):
        with pytest.raises(RuntimeError, match="unavailable"):
            CALIB_DATASETS["pile-10k"](2, 8, tokenizer=FakeTokenizer())


class ChatTokenizer(FakeTokenizer):
    """HF-shaped tokenizer stub with a chat template."""

    chat_template = "stub"

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=True):
        if any(m["role"] == "system" for m in messages) and getattr(
                self, "reject_system", False):
            raise ValueError("system role unsupported")
        text = "".join(f"<|{m['role']}|>{m['content']}" for m in messages)
        return text + ("<|assistant|>" if add_generation_prompt else "")


class TestChatTemplate:
    def test_rendered_through_template(self, tmp_path):
        p = tmp_path / "t.jsonl"
        with open(p, "w") as f:
            for i in range(8):
                f.write(json.dumps({"text": f"question {i} " * 4}) + "\n")
        tok = ChatTokenizer()
        ids, mask = get_calib_batch(
            f"local:{p}", nsamples=4, seqlen=64, tokenizer=tok,
            apply_chat_template=True)
        assert ids.shape == (4, 64)
        # rendered text starts with "<|user|>" — check via the same stub
        want = tok("<|user|>")["input_ids"]
        assert ids[0, : len(want)].tolist() == want

    def test_system_prompt_and_fallback(self, tmp_path):
        p = tmp_path / "t.jsonl"
        with open(p, "w") as f:
            for i in range(8):
                f.write(json.dumps({"text": "hello " * 8}) + "\n")
        tok = ChatTokenizer()
        ids, _ = get_calib_batch(
            f"local:{p}", nsamples=2, seqlen=64, tokenizer=tok,
            apply_chat_template=True, system_prompt="be brief")
        want = tok("<|system|>be brief")["input_ids"]
        assert ids[0, : len(want)].tolist() == want
        # template that rejects system role → retried without it
        tok2 = ChatTokenizer()
        tok2.reject_system = True
        ids2, _ = get_calib_batch(
            f"local:{p}", nsamples=2, seqlen=64, tokenizer=tok2,
            apply_chat_template=True, system_prompt="be brief")
        want2 = tok2("<|user|>")["input_ids"]
        assert ids2[0, : len(want2)].tolist() == want2

    def test_message_list_samples(self, tmp_path):
        p = tmp_path / "m.jsonl"
        msgs = [{"role": "user", "content": "hi there"},
                {"role": "assistant", "content": "hello"},
                {"role": "user", "content": "explain"}]
        with open(p, "w") as f:
            for _ in range(4):
                f.write(json.dumps({"messages": msgs}) + "\n")
        tok = ChatTokenizer()
        ids, _ = get_calib_batch(
            f"local:{p}", nsamples=2, seqlen=64, tokenizer=tok,
            apply_chat_template=True)
        want = tok("<|user|>hi there<|assistant|>hello")["input_ids"]
        assert ids[0, : len(want)].tolist() == want

    def test_no_template_warns_and_uses_raw(self, tmp_path):
        p = tmp_path / "t.txt"
        p.write_text("\n".join(["hello world " * 10] * 8))
        ids, _ = get_calib_batch(
            f"local:{p}", nsamples=2, seqlen=32, tokenizer=FakeTokenizer(),
            apply_chat_template=True)   # FakeTokenizer has no template
        assert ids.shape == (2, 32)


class TestMixing:
    def test_mixed_synthetic(self):
        ids, mask = get_calib_batch("synthetic:0.5,synthetic",
                                    nsamples=8, seqlen=16, vocab_size=50)
        assert ids.shape == (8, 16) and ids.max() < 50

    def test_mixed_with_local(self, tmp_path):
        p = tmp_path / "t.txt"
        p.write_text("\n".join(["hello world " * 10] * 20))
        ids, mask = get_calib_batch(
            f"synthetic:0.5,local:{p}", nsamples=8, seqlen=32,
            tokenizer=FakeTokenizer(), vocab_size=250)
        assert ids.shape == (8, 32)


class TestSubprocessIsolation:
    def test_subprocess_error_propagates(self, monkeypatch):
        """AR_CALIB_SUBPROCESS: the hub loader runs in a spawn child; a
        failure there surfaces as the same actionable RuntimeError."""
        monkeypatch.setenv("AR_CALIB_SUBPROCESS", "1")
        monkeypatch.setenv("AR_CALIB_SUBPROCESS_TIMEOUT", "60")
        with pytest.raises(RuntimeError, match="unavailable"):
            CALIB_DATASETS["pile-10k"](2, 8, tokenizer=FakeTokenizer())
