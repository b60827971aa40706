"""Round-7 property tests: the documents.text cross-engine character-domain
guard (round-6 verdict item 3, generalized to the REAL exposure).

The verdict asked for a casemap guard over documents.text "because
ql05/ql22/ql27 lowercase document text". Checked round 7: they do not —
no query or operator case-maps documents.text (tokenization is plain
``F.split(text, ' ')``, `operators/text.py:38`). The actual cross-engine
exposure of document text is wider than case mapping:

- ``bpe_ish_token_count`` twins Java regex (Spark) against RE2 (DuckDB)
  over ``[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]`` (ql13/ql53). The engines'
  ``\\s`` classes differ off-ASCII-printable (Java includes U+000B, RE2
  does not; neither includes NBSP) — a fixture with a vertical tab or
  exotic whitespace splits the twin.
- punctuation-ratio / redaction twins (ql04, ql28) regex-match text on
  both engines with the same class-semantics seam.
- length()/substring twins count UTF-16-vs-UTF-8-backed codepoints; any
  astral or combining character makes off-by-N a regeneration risk.
- and, if case mapping is ever ADDED over documents, the full-vs-simple
  mapping divergence pinned by test_properties_r6.py applies verbatim.

All four classes are simultaneously unreachable while documents.text
stays printable ASCII — which the generator currently guarantees (25
distinct chars, measured at every SF). This test FAILS on the first
fixture regeneration that leaves that domain, pointing at the paragraph
above instead of surfacing as an unexplained gate hash flip.
"""

from __future__ import annotations

import os
import unicodedata

import duckdb
import pytest

from tests.conftest import SF_DIR


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_fixture_documents_text_within_cross_engine_safe_domain(sf):
    path = os.path.join(os.path.dirname(SF_DIR), sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} not generated")
    con = duckdb.connect()
    try:
        chars = {
            r[0]
            for r in con.sql(
                "SELECT DISTINCT unnest(string_split_regex(text, '')) "
                f"FROM read_parquet('{path}')"
            ).fetchall()
            if r[0]
        }
    finally:
        con.close()
    bad = {
        (ch, f"U+{ord(ch):04X}", unicodedata.name(ch, "?"))
        for ch in chars
        if not (32 <= ord(ch) <= 126)
    }
    assert not bad, (
        f"documents.text in {sf} left the printable-ASCII domain: {sorted(bad)}; "
        "the regex/length/casemap twins over document text are only "
        "cross-engine-safe inside it — see this file's module docstring "
        "and FIXTURES.md §3 before accepting the new fixture"
    )
