"""Deterministic tokenization with two span coordinate systems.

Mirrors the reference's tokenize step (ref jerex/datasets.py:81-108):
per original token, a sub-word encoder emits one or more piece ids and
the cumulative sub-word offsets ``(sub_start, sub_end)`` (end-exclusive)
are recorded alongside the original token index.  Both coordinate
systems (sub-word offsets for scoring, token indices for all outputs —
ref jerex/entities.py:157-166, SURVEY.md §1.4) are kept everywhere.

The surrogate sub-word encoder splits each token into fixed-size
character chunks and hashes each chunk into a stable vocab id via
crc32 — deterministic across processes (never Python ``hash``).
An empty token falls back to ``[UNK]`` (ref datasets.py:94-95).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

from .config import DEFAULT, PipelineConfig

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_WS = re.compile(r"\s+")

_SPECIAL_IDS = 1000  # ids below this are reserved (unk etc.)


@dataclass(frozen=True)
class TokenizedDoc:
    sentences: list[list[str]]        # sentences -> token phrases
    tok_sent_idx: list[int]           # per doc-token: sentence index
    tok_doc_idx: list[int]            # per doc-token: token index in doc
    sub_start: list[int]              # per doc-token: sub-word start
    sub_end: list[int]                # per doc-token: sub-word end (excl)
    encoding: list[int]               # flat sub-word id sequence
    phrases: list[str]                # per doc-token: surface form


def piece_id(piece: str, cfg: PipelineConfig = DEFAULT) -> int:
    return _SPECIAL_IDS + zlib.crc32(piece.encode("utf-8")) % (
        cfg.vocab_size - _SPECIAL_IDS
    )


_TOK_CACHES: dict[str | None, dict[str, list[int]]] = {}
_TOK_CACHE_MAX = 1 << 18


def encode_token(token: str, cfg: PipelineConfig = DEFAULT) -> list[int]:
    """Sub-word ids for one token; [UNK] fallback for empty encodings
    (ref datasets.py:94-95 applies the same fallback after
    ``tokenizer.encode``).

    With ``cfg.wordpiece_vocab`` set, the encoder is real WordPiece
    over that vocab file (wordpiece.py) — the reference's tokenize
    path; otherwise the crc32 chunk surrogate.  Either way the offset
    map downstream is identical in shape.

    Memoized per process, one dict per vocab keyed by the bare token
    string (str hashes are cached by CPython; a (vocab, token) tuple
    key allocated + hashed a fresh tuple per token in the hot loop) —
    web-corpus token distributions are Zipfian, so the hit rate is
    high."""
    cache = _TOK_CACHES.get(cfg.wordpiece_vocab)
    if cache is None:
        cache = _TOK_CACHES.setdefault(cfg.wordpiece_vocab, {})
    hit = cache.get(token)
    if hit is not None:
        return hit
    if cfg.wordpiece_vocab is not None:
        from .wordpiece import get_tokenizer
        wp = get_tokenizer(cfg.wordpiece_vocab)
        ids = wp.encode(token) or [wp.unk_id]
    elif not token:
        ids = [cfg.unk_id]
    else:
        k = cfg.subword_chunk
        ids = [piece_id(token[i:i + k], cfg)
               for i in range(0, len(token), k)] or [cfg.unk_id]
    if len(cache) < _TOK_CACHE_MAX:
        cache[token] = ids
    return ids


def split_sentences(text: str) -> list[list[str]]:
    sents = []
    for raw in _SENT_SPLIT.split(text):
        toks = [t for t in _WS.split(raw.strip()) if t]
        if toks:
            sents.append(toks)
    return sents


def tokenize_document(text: str, cfg: PipelineConfig = DEFAULT) -> TokenizedDoc:
    sentences = split_sentences(text)
    tok_sent_idx: list[int] = []
    tok_doc_idx: list[int] = []
    sub_start: list[int] = []
    sub_end: list[int] = []
    encoding: list[int] = []
    phrases: list[str] = []
    doc_i = 0
    for s_i, sent in enumerate(sentences):
        for tok in sent:
            ids = encode_token(tok, cfg)
            tok_sent_idx.append(s_i)
            tok_doc_idx.append(doc_i)
            sub_start.append(len(encoding))
            encoding.extend(ids)
            sub_end.append(len(encoding))
            phrases.append(tok)
            doc_i += 1
    return TokenizedDoc(
        sentences=sentences, tok_sent_idx=tok_sent_idx,
        tok_doc_idx=tok_doc_idx, sub_start=sub_start, sub_end=sub_end,
        encoding=encoding, phrases=phrases,
    )


def enumerate_spans(doc: TokenizedDoc, cfg: PipelineConfig = DEFAULT):
    """All intra-sentence token spans of size 1..max_span_size.

    Mirrors ref jerex/sampling/sampling_common.py:77-98: spans never
    cross sentence boundaries, which keeps the candidate set linear in
    document length.  Yields (start, end) end-exclusive token indices
    plus the sentence index.
    """
    out = []
    base = 0
    for s_i, sent in enumerate(doc.sentences):
        n = len(sent)
        for size in range(1, cfg.max_span_size + 1):
            for i in range(0, n - size + 1):
                out.append((base + i, base + i + size, s_i))
        base += n
    return out
