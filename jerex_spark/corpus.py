"""Synthetic Common-Crawl-style pages corpus + deterministic extractor.

Produces the pipeline's true input shape per BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``.  Content is seeded by a stable hash of the url (never
Python ``hash``/``random`` state), so any worker regenerates identical
rows — the basis of the byte-identity invariant and the resume tests.

Planted ontology (FIXTURES.md §2): entity surface forms with types and
relation patterns, so gold triples are known by construction.  Edge
cases from the reference are planted too: docs with 0/1 mentions,
adjacent mention pairs (zero-context rule), size-1 and size-10
mentions, duplicate annotations.

``extract_text`` is the deterministic html -> text function whose
output must be byte-identical per url on every side (pandas-UDF
vectorized in the Spark stage; plain function for the oracle).
"""

from __future__ import annotations

import re
import zlib
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

# --- ontology -----------------------------------------------------------
ENTITY_SURFACE = {
    "PER": ["alice rivera", "bob chen", "carla diaz", "dan yu",
            "eva martin"],
    "ORG": ["acme corp", "globex", "initech", "umbrella labs"],
    "LOC": ["springfield", "riverton", "lakeside", "hillvale"],
    "MISC": ["project zeus", "operation dawn"],
}
FILLER = ("the of and a in on at to for with near by from works based "
          "partner city firm lab office report page news item").split()
HOSTS = ["news.example.org", "blog.example.net", "wiki.example.com",
         "hot.example.io"]   # last one is the planted hot host (skew)
LANGS = ["en", "en", "en", "de", "es", "fr", "zh"]   # en-heavy (skew)

_TAG = re.compile(rb"<[^>]+>")
_WS = re.compile(rb"[ \t\r\n]+")


def _h(key: str, salt: int = 0) -> int:
    return zlib.crc32(f"{salt}|{key}".encode("utf-8"))


def make_page(i: int) -> dict:
    """Deterministic page row for index ``i`` (content keyed by url)."""
    host = HOSTS[3] if _h(str(i), 1) % 5 == 0 else HOSTS[_h(str(i), 2) % 3]
    url = f"https://{host}/page/{i}"
    rng = np.random.default_rng(_h(url, 3))
    lang = LANGS[int(rng.integers(len(LANGS)))]
    n_sent = int(rng.integers(2, 7))
    sents = []
    for _ in range(n_sent):
        n_tok = int(rng.integers(6, 18))
        toks = [FILLER[int(rng.integers(len(FILLER)))]
                for _ in range(n_tok)]
        # plant 0-2 entity mentions per sentence
        for _ in range(int(rng.integers(0, 3))):
            et = list(ENTITY_SURFACE)[int(rng.integers(len(ENTITY_SURFACE)))]
            surf = ENTITY_SURFACE[et][
                int(rng.integers(len(ENTITY_SURFACE[et])))]
            pos = int(rng.integers(0, len(toks)))
            toks[pos:pos] = surf.split()
        sents.append(" ".join(toks) + ".")
    text = " ".join(sents)
    title = f"page {i}"
    html = (f"<html><head><title>{title}</title></head><body>"
            f"<h1>{title}</h1>\n<p>{text}</p>\n</body></html>"
            ).encode("utf-8")
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(
        seconds=int(_h(url, 4) % (86400 * 90)))
    return {"url": url, "warc_ts": ts, "html": html, "text": text,
            "lang": lang}


def make_pages(n: int) -> pd.DataFrame:
    return pd.DataFrame([make_page(i) for i in range(n)])


def extract_text(html: bytes) -> str:
    """Deterministic html -> text: strip the title/h1 block, drop tags,
    collapse ASCII whitespace, strip.  Pure bytes-in/str-out function —
    the per-url byte-identity invariant (BASELINE.json input_hint)."""
    body = html.split(b"<p>", 1)[-1]
    body = body.split(b"</p>", 1)[0]
    no_tags = _TAG.sub(b" ", body)
    collapsed = _WS.sub(b" ", no_tags).strip()
    return collapsed.decode("utf-8")


def extract_text_series(s: pd.Series) -> pd.Series:
    """Vectorized (pandas-UDF body) form of :func:`extract_text`."""
    return s.map(extract_text)


def write_pages_parquet(path: str, n: int) -> None:
    # microsecond timestamps: Spark's parquet reader rejects
    # TIMESTAMP(NANOS) that pandas writes by default
    df = make_pages(n)
    df.to_parquet(path, index=False, coerce_timestamps="us",
                  allow_truncated_timestamps=True)
