"""Link / text extraction from html — vectorized pandas UDFs.

This is the web-page analogue of the reference's follow-list tag
parsing (ParsePubkeys, reference pkg/crawler/process.go:227-255):
 - anchors with no/self href are dropped (self-follow is "no signal"),
 - the result is unique + sorted (sliceutils.Unique sorts,
   pkg/utils/sliceutils/slice.go:13-29),
 - a page with more than 100,000 anchors is skipped entirely
   (returns []) — the reference returns nil for >100k tags,
 - NO validity check here; URL validity is a separate filter
   (is_valid_url, the analogue of nostr.IsValidPublicKey gating in
   resolveIDs, pkg/crawler/process.go:190-196).

extract_text must be byte-identical to the datagen `text` column per
url — the input_hint correctness invariant.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..schemas import MAX_OUTLINKS_TAGS

_HREF_RE = re.compile(rb'<a\s[^>]*?href="([^"]*)"', re.IGNORECASE)
_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)


def _links_one(html: bytes | None, url: str | None) -> list[str]:
    if html is None:
        return []
    hrefs = _HREF_RE.findall(html)
    if len(hrefs) == 0 or len(hrefs) > MAX_OUTLINKS_TAGS:
        return []
    out = set()
    for h in hrefs:
        try:
            link = h.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if link and link != url:
            out.add(link)
    return sorted(out)


def _text_one(html: bytes | None) -> str | None:
    if html is None:
        return None
    paras = _P_RE.findall(html)
    return "\n".join(p.decode("utf-8") for p in paras)


@F.pandas_udf(ArrayType(StringType()))
def extract_links(html: pd.Series, url: pd.Series) -> pd.Series:
    return pd.Series(
        [_links_one(h, u) for h, u in zip(html, url)], index=html.index, dtype=object
    )


@F.pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return pd.Series([_text_one(h) for h in html], index=html.index, dtype=object)


_SCHEMES = ("https://", "http://")
MAX_URL_LEN = 2048


def is_valid_url(col):
    """Column predicate: scheme allowlist + non-empty host + length cap
    (role of nostr.IsValidPublicKey in resolveIDs)."""
    return (
        col.isNotNull()
        & (F.length(col) <= MAX_URL_LEN)
        & (
            col.startswith(_SCHEMES[0]) & (F.length(col) > len(_SCHEMES[0]))
            | col.startswith(_SCHEMES[1]) & (F.length(col) > len(_SCHEMES[1]))
        )
    )


def url_host(col):
    """Host component of a url (for politeness bucketing / salting)."""
    return F.regexp_extract(col, r"^https?://([^/]+)", 1)
