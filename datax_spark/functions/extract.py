"""Deterministic HTML → text extraction, Arrow-vectorized.

The engine's heavy per-record transform — the role dx_groovy plays in the
reference (``core/.../transformer/GroovyTransformer.java:24-88``: arbitrary
user code on the reader thread). Per the input_hint, the hot path is a
**vectorized pandas UDF** (Arrow batches, no per-row Python dispatch) and
the extraction itself is a pure, dependency-free, byte-deterministic
function so the "byte-identical extracted text per url" invariant holds
across replays, partitionings, and cluster sizes.

Pipeline: charset sniff (meta tag, else utf-8) → decode with
``errors='replace'`` (deterministic U+FFFD substitution) → drop
script/style/comment blocks → strip tags → decode HTML entities → collapse
whitespace. All regex-based; no random, no locale, no time dependence.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F, types as T
from pyspark.sql.functions import pandas_udf

_CHARSET_RE = re.compile(rb'charset=["\']?([A-Za-z0-9_\-]+)', re.IGNORECASE)
_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

# small fixed entity table (deterministic; html.unescape would also work but
# we pin the exact subset so the contract is explicit and stable)
_ENTITIES = {
    "&nbsp;": " ",
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))

_KNOWN_CODECS = {"utf-8", "utf8", "latin-1", "latin1", "iso-8859-1", "ascii", "windows-1252", "cp1252"}


def sniff_charset(raw: bytes) -> str:
    """Charset from the first meta tag; unknown/absent → utf-8."""
    m = _CHARSET_RE.search(raw[:2048])
    if m:
        cs = m.group(1).decode("ascii", "replace").lower()
        if cs in _KNOWN_CODECS:
            return cs
    return "utf-8"


def extract_text(raw: bytes | None) -> str | None:
    """Pure-python reference extractor — the invariant oracle."""
    if raw is None:
        return None
    cs = sniff_charset(raw)
    s = raw.decode(cs, errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)
    s = _WS_RE.sub(" ", s).strip()
    return s


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched wrapper; order-preserving within each batch."""
    return html.map(extract_text)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Attach extracted text column. Stays a projection — no shuffle."""
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
