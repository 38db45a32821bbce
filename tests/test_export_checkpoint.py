"""Torch-free tests of scripts/export_checkpoint.py: a fake
pytorch-lightning checkpoint dict (numpy tensors, the reference's
``model.``-prefixed key layout — ref jerex/model.py:55,356) must
convert to an .npz artifact that load_weights() consumes, with the
geometry derived from tensor shapes and the ontology/thresholds from
``hyper_parameters``.  The only line of the script these tests cannot
reach is ``torch.load`` itself.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from test_checkpoint_swap import _bert_state_dict, _mi_state_dict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))

from export_checkpoint import (  # noqa: E402
    convert, derive_cfg, export, strip_lightning)

from jerex_spark.config import DEFAULT  # noqa: E402


def _fake_ckpt(extra_nonmodel=True, with_bert=False, hparams=None):
    sd = dict(_mi_state_dict())
    if with_bert:
        sd.update(_bert_state_dict(vocab=DEFAULT.vocab_size))
    wrapped = {f"model.{k}": v for k, v in sd.items()}
    if extra_nonmodel:
        wrapped["_compute_loss.some_buffer"] = np.zeros(3, np.float32)
    ckpt = {"state_dict": wrapped}
    if hparams is not None:
        ckpt["hyper_parameters"] = hparams
    return ckpt


def test_strip_lightning_prefix_and_drop():
    ckpt = _fake_ckpt()
    sd = strip_lightning(ckpt)
    assert "mention_localization.linear.weight" in sd
    assert not any(k.startswith("model.") for k in sd)
    assert not any("_compute_loss" in k for k in sd)
    # already-bare dicts pass through unchanged
    bare = strip_lightning({"state_dict": _mi_state_dict()})
    assert "mention_localization.linear.weight" in bare


def test_derive_cfg_from_shapes_and_hparams():
    hp = {"entity_types": {"PER": 1, "ORG": 2, "LOC": 3, "MISC": 4},
          "relation_types": {"works_at": 1, "based_in": 2,
                             "partner_of": 3},
          "mention_threshold": 0.8, "coref_threshold": 0.75,
          "rel_threshold": 0.55}
    ckpt = _fake_ckpt(with_bert=True, hparams=hp)
    cfg = derive_cfg(strip_lightning(ckpt), hp)
    assert cfg.hidden_size == DEFAULT.hidden_size
    assert cfg.meta_embedding_size == DEFAULT.meta_embedding_size
    assert cfg.max_span_size == DEFAULT.max_span_size
    assert cfg.entity_types == ("PER", "ORG", "LOC", "MISC")
    assert cfg.relation_types == ("works_at", "based_in", "partner_of")
    assert cfg.mention_threshold == 0.8
    assert cfg.rel_threshold == 0.55
    assert cfg.relation_mode == "multi_instance"
    assert cfg.vocab_size == DEFAULT.vocab_size   # from bert tok emb
    # no hparams: ontology synthesized with the right cardinalities
    cfg2 = derive_cfg(strip_lightning(_fake_ckpt()))
    assert len(cfg2.entity_types) == len(DEFAULT.entity_types)
    assert cfg2.entity_types[0] == "ENT_0"


def test_convert_and_export_roundtrip(tmp_path):
    from jerex_spark.weights import load_weights_npz
    ckpt = _fake_ckpt(with_bert=True)
    w, report, cfg = convert(ckpt, heads=4)
    assert report["encoder"] == "checkpoint_bert"
    assert report["variant"] == "multi_instance"
    out = str(tmp_path / "exported.npz")
    export(ckpt, out, heads=4)
    loaded = load_weights_npz(out)
    np.testing.assert_array_equal(
        loaded.men_w1,
        np.asarray(ckpt["state_dict"]
                   ["model.mention_localization.linear.weight"]).T)
    assert loaded.bert is not None
    np.testing.assert_array_equal(
        loaded.bert.tok,
        ckpt["state_dict"]
        ["model.bert.embeddings.word_embeddings.weight"])


def test_export_copies_vocab(tmp_path):
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("[PAD]\n[UNK]\nhello\nworld\n")
    out = str(tmp_path / "art.npz")
    export(_fake_ckpt(), out, tokenizer_dir=str(tok_dir))
    vocab = str(tmp_path / "art.vocab.txt")
    assert os.path.exists(vocab)
    assert "hello" in open(vocab).read()
