"""EWTS conversion pinned by an independent vector file (VERDICT r1 item 9).

The vectors in tests/data/ewts_vectors.tsv were written from the THL
Extended Wylie standard (the scheme pyewts implements), independently of
text/ewts.py. Every mismatch found while introducing the file was
adjudicated against the standard — implementation bugs were fixed,
vector errors corrected — and the adjudications are documented in the
data file / this test's history.
"""

from pathlib import Path

import pytest

from ocr_inference_tpu.text.ewts import to_unicode, to_wylie

_VECTORS = []
for _line in (
    Path(__file__).parent / "data" / "ewts_vectors.tsv"
).read_text().splitlines():
    if not _line or _line.startswith("#"):
        continue
    _parts = _line.split("\t")
    _VECTORS.append((_parts[0], _parts[1], _parts[2] if len(_parts) > 2 else "b"))

assert len(_VECTORS) > 200, f"vector file truncated? {len(_VECTORS)}"


@pytest.mark.parametrize(
    "wylie,unicode_,flags", _VECTORS, ids=[v[0] for v in _VECTORS]
)
def test_ewts_vector(wylie, unicode_, flags):
    if flags in ("b", "u"):
        assert to_unicode(wylie) == unicode_, (
            f"to_unicode({wylie!r}) = {to_unicode(wylie)!r} != {unicode_!r}"
        )
    if flags in ("b", "w"):
        assert to_wylie(unicode_) == wylie, (
            f"to_wylie({unicode_!r}) = {to_wylie(unicode_)!r} != {wylie!r}"
        )


def test_vector_coverage():
    """The file must keep covering the hard families."""
    wylies = {v[0] for v in _VECTORS}
    assert "bsgrubs" in wylies          # prefix + superscribed + subscribed
    assert "g.yag" in wylies and "gyag" in wylies  # '.' disambiguator
    assert "k+Sha" in wylies            # explicit Sanskrit stacking
    assert "k-i" in wylies              # reversed gigu
    assert "oM ma Ni pad+me hUM" in wylies
