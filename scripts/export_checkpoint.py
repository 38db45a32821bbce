"""Export a trained JEREX Lightning checkpoint to this repo's weight
artifact (.npz) so a published model drives the Spark pipeline.

Intended to run on a machine WITH torch (this sandbox has neither
torch nor network access — documented boundary in BENCH.md): torch is
imported only inside main() to deserialize the .ckpt file.  Everything
else — prefix stripping, geometry derivation, head/encoder mapping,
artifact writing — is torch-free and unit-tested here against a fake
checkpoint dict (tests/test_export_checkpoint.py), so the one
untestable line in this container is ``torch.load``.

Checkpoint layout (ref jerex/model.py:356-366 ``load_from_checkpoint``;
jerex/models/joint_models.py:30-40): a pytorch-lightning ``.ckpt``
pickle holding

- ``state_dict``: parameters of the LightningModule, whose joint model
  lives at attribute ``model`` — so every key we need is prefixed
  ``model.`` (``model.bert.embeddings...``,
  ``model.mention_localization.linear.weight``, ...).  Keys outside
  ``model.`` (e.g. a loss module's buffers) are dropped with a notice.
- ``hyper_parameters``: ``model_type`` ('joint_multi_instance' /
  'joint_global'), ``entity_types`` / ``relation_types`` ordered
  dicts, thresholds — used to derive the PipelineConfig the user must
  mirror at load time.

Usage (outside the sandbox):

    python scripts/export_checkpoint.py model.ckpt --out jerex.npz \
        --tokenizer /path/to/tokenizer_dir [--heads 12]

Then point the pipeline at the artifact:

    cfg = dataclasses.replace(DEFAULT, weights_path='jerex.npz',
                              wordpiece_vocab='vocab.txt',
                              **<printed geometry overrides>)
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jerex_spark.config import DEFAULT, PipelineConfig  # noqa: E402
from jerex_spark.weights import (  # noqa: E402
    load_jerex_state_dict, save_weights)


def strip_lightning(ckpt: dict) -> dict:
    """Pull the joint model's tensors out of a Lightning checkpoint
    dict: unwrap ``state_dict`` if present, keep ``model.``-prefixed
    keys (stripped), drop the rest with a notice.  Accepts an
    already-bare state_dict too (keys without the prefix)."""
    sd = ckpt.get("state_dict", ckpt)
    if not any(k.startswith("model.") for k in sd):
        return dict(sd)
    out, dropped = {}, []
    for k, v in sd.items():
        if k.startswith("model."):
            out[k[len("model."):]] = v
        else:
            dropped.append(k)
    if dropped:
        print(f"dropped {len(dropped)} non-model key(s): "
              f"{dropped[:5]}{'...' if len(dropped) > 5 else ''}")
    return out


def _shape(v) -> tuple:
    return tuple(getattr(v, "shape", ()))


def derive_cfg(sd: dict, hparams: dict | None = None,
               heads: int = 12) -> PipelineConfig:
    """PipelineConfig matching the checkpoint's geometry, derived from
    tensor shapes (authoritative) + hyper_parameters (ontology,
    thresholds, variant).  load_jerex_state_dict shape-checks every
    tensor against this cfg, so a wrong derivation fails loudly."""
    hp = hparams or {}
    d = _shape(sd["mention_localization.linear.bias"])[0]
    size_emb = _shape(sd["mention_localization.size_embeddings.weight"])
    n_et = _shape(sd["entity_classification.entity_classifier.bias"])[0]
    n_rt = _shape(sd["relation_classification.rel_classifier.bias"])[0]

    def types(key, n, prefix):
        got = hp.get(key)
        if got:  # ref data layout: ordered dict label -> meta
            return tuple(got)
        return tuple(f"{prefix}_{i}" for i in range(n))

    over = dict(
        hidden_size=d,
        meta_embedding_size=size_emb[1],
        max_span_size=size_emb[0] - 1,
        edit_dist_buckets=_shape(
            sd["coreference_resolution.coref_ed_embeddings.weight"])[0],
        entity_types=types("entity_types", n_et, "ENT"),
        relation_types=types("relation_types", n_rt, "REL"),
        bert_num_heads=heads,
        relation_mode=("global" if "entity_pair_representation."
                       "entity_pair_linear.weight" in sd
                       else "multi_instance"),
    )
    if "relation_classification.token_distance_embeddings.weight" in sd:
        over["token_dist_buckets"] = _shape(
            sd["relation_classification.token_distance_embeddings"
               ".weight"])[0]
        over["sent_dist_buckets"] = _shape(
            sd["relation_classification.sentence_distance_embeddings"
               ".weight"])[0]
    if "bert.embeddings.word_embeddings.weight" in sd:
        over["vocab_size"] = _shape(
            sd["bert.embeddings.word_embeddings.weight"])[0]
        over["max_positions"] = _shape(
            sd["bert.embeddings.position_embeddings.weight"])[0]
    for thr in ("mention_threshold", "coref_threshold", "rel_threshold"):
        if hp.get(thr) is not None:
            over[thr] = float(hp[thr])
    return dataclasses.replace(DEFAULT, **over)


def convert(ckpt: dict, heads: int = 12):
    """(Lightning checkpoint dict) -> (SurrogateWeights, report, cfg).
    Torch-free: tensor values may be torch tensors OR plain numpy
    arrays (the loaders duck-type .detach()/.numpy())."""
    sd = strip_lightning(ckpt)
    cfg = derive_cfg(sd, ckpt.get("hyper_parameters"), heads)
    w, report = load_jerex_state_dict(sd, cfg)
    return w, report, cfg


def export(ckpt: dict, out_path: str, heads: int = 12,
           tokenizer_dir: str | None = None) -> PipelineConfig:
    w, report, cfg = convert(ckpt, heads)
    save_weights(w, out_path)
    vocab_path = None
    if tokenizer_dir:
        src = os.path.join(tokenizer_dir, "vocab.txt")
        if os.path.exists(src):
            import shutil
            vocab_path = os.path.splitext(out_path)[0] + ".vocab.txt"
            shutil.copyfile(src, vocab_path)
        else:
            print(f"WARNING: {src} not found — pass the HF tokenizer "
                  f"dir (wordpiece_vocab stays unset)")
    print(f"wrote {out_path}: encoder={report['encoder']} "
          f"variant={report['variant']} "
          f"consumed={len(report['consumed'])} keys "
          f"kept_surrogate={len(report['kept_surrogate'])} fields")
    print("mirror this geometry at load time "
          "(dataclasses.replace(DEFAULT, ...)):")
    for f in ("hidden_size", "meta_embedding_size", "max_span_size",
              "edit_dist_buckets", "token_dist_buckets",
              "sent_dist_buckets", "vocab_size", "max_positions",
              "entity_types", "relation_types", "relation_mode",
              "bert_num_heads", "mention_threshold", "coref_threshold",
              "rel_threshold"):
        print(f"  {f}={getattr(cfg, f)!r}")
    print(f"  weights_path={out_path!r}")
    if vocab_path:
        print(f"  wordpiece_vocab={vocab_path!r}")
    return cfg


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help=".ckpt file (torch/Lightning)")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--heads", type=int, default=12,
                    help="encoder attention heads (BERT-base: 12); not "
                         "stored in the state_dict")
    ap.add_argument("--tokenizer", default=None,
                    help="HF tokenizer dir; its vocab.txt is copied "
                         "next to the artifact")
    args = ap.parse_args(argv)
    try:
        import torch
    except ImportError:
        raise SystemExit(
            "torch is required to deserialize the .ckpt — run this "
            "script on the training machine; the conversion itself is "
            "torch-free and already unit-tested in this repo")
    ckpt = torch.load(args.checkpoint, map_location="cpu",
                      weights_only=False)
    export(ckpt, args.out, args.heads, args.tokenizer)


if __name__ == "__main__":
    main()
