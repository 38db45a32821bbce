"""WordPiece sub-word tokenizer with the reference's semantics.

The reference encodes each (pre-split) token phrase with a BERT
tokenizer and records cumulative sub-word offsets, falling back to
``[UNK]`` when a phrase encodes to nothing (ref jerex/datasets.py:
81-108).  This module reimplements that encode path from the public
BERT algorithm (Devlin et al. 2019; the greedy longest-match-first
WordPiece + basic tokenization used by every open-source BERT vocab):

* basic pass — clean control chars, optional lowercase + accent strip
  (NFD, drop combining marks), split punctuation into single-char
  tokens, whitespace split;
* WordPiece pass — per word, greedy longest prefix in the vocab, with
  the ``##`` continuation prefix for non-initial pieces; whole word ->
  ``[UNK]`` when no match or the word exceeds the char budget.

The vocab file is DATA, not code: standard one-token-per-line
``vocab.txt`` (id = line number), so a published checkpoint's vocab
drops in unchanged.  Plugged into tokenization.encode_token via
``PipelineConfig.wordpiece_vocab`` — sentence splitting, offset maps
and every downstream operator are unchanged.
"""

from __future__ import annotations

import unicodedata

_MAX_CHARS_PER_WORD = 100


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    # ASCII ranges BERT treats as punctuation even where unicode
    # categories disagree (e.g. '$', '`')
    if (33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96
            or 123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


# CJK Unified Ideograph blocks from the public BERT basic tokenizer's
# chinese-char spacing pass (Devlin et al. 2019 reference code): each
# ideograph becomes its own word, so multilingual vocabs tokenize CJK
# runs per-character instead of falling through to [UNK]
_CJK_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF), (0x2F800, 0x2FA1F),
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def basic_tokenize(text: str, lower: bool = True) -> list[str]:
    """Clean + CJK spacing + (lower, strip accents) + punctuation split
    + ws split."""
    cleaned = []
    for ch in text:
        if ch == "\x00" or ch == "�" or _is_control(ch):
            continue
        if _is_cjk(ch):
            cleaned.append(f" {ch} ")
        else:
            cleaned.append(" " if ch.isspace() else ch)
    out: list[str] = []
    for word in "".join(cleaned).split():
        if lower:
            word = word.lower()
            word = "".join(c for c in unicodedata.normalize("NFD", word)
                           if unicodedata.category(c) != "Mn")
        buf = []
        for ch in word:
            if _is_punct(ch):
                if buf:
                    out.append("".join(buf))
                    buf = []
                out.append(ch)
            else:
                buf.append(ch)
        if buf:
            out.append("".join(buf))
    return out


class WordPieceTokenizer:
    def __init__(self, vocab: dict[str, int], lower: bool = True):
        if "[UNK]" not in vocab:
            raise ValueError("WordPiece vocab must contain [UNK]")
        self.vocab = vocab
        self.unk_id = vocab["[UNK]"]
        self.lower = lower

    @classmethod
    def from_file(cls, path: str, lower: bool = True) -> "WordPieceTokenizer":
        vocab: dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                tok = line.rstrip("\n")
                if tok:
                    vocab[tok] = i
        return cls(vocab, lower=lower)

    def wordpiece(self, word: str) -> list[int]:
        """Greedy longest-match-first sub-word split of one word."""
        if len(word) > _MAX_CHARS_PER_WORD:
            return [self.unk_id]
        pieces: list[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]      # whole word -> [UNK]
            pieces.append(cur)
            start = end
        return pieces

    def encode(self, phrase: str) -> list[int]:
        """Sub-word ids for one token phrase — the reference's
        ``tokenizer.encode(phrase, add_special_tokens=False)``.
        Returns [] for phrases with no encodable content; the caller
        applies the [UNK] fallback (ref datasets.py:94-95)."""
        ids: list[int] = []
        for word in basic_tokenize(phrase, lower=self.lower):
            ids.extend(self.wordpiece(word))
        return ids


def write_vocab(path: str, tokens: list[str]) -> None:
    """Write a standard vocab.txt (one token per line, id = line no)."""
    with open(path, "w", encoding="utf-8") as f:
        for t in tokens:
            f.write(t + "\n")


_TOKENIZER_CACHE: dict[str, WordPieceTokenizer] = {}


def get_tokenizer(path: str) -> WordPieceTokenizer:
    hit = _TOKENIZER_CACHE.get(path)
    if hit is None:
        hit = _TOKENIZER_CACHE[path] = WordPieceTokenizer.from_file(path)
    return hit
