"""Hypothesis fuzz for the round-8 text/packing operators: random
multi-line corpora (tabs, repeated lines, empty and whitespace-only
segments) cross-checked against pure-Python references. Few examples —
each is a real Spark job — but each example exercises every branch the
fixtures hand-pick: empty docs, whitespace-only lines, duplicate lines
vs duplicate paragraphs, and packing windows straddling documents.

Trim semantics under test: Spark's TRIM (and DuckDB's) strip ASCII
SPACES only — the Python reference uses ``strip(' ')``, NOT ``strip()``
(which would also eat tabs and silently diverge).

Rounding: both engines round fractions at 6 decimals; a half-way case
needs a segment/char count that is a multiple of 128 (2·10⁶ = 2⁷·5⁶·…),
and the generated corpora stay far below that, so HALF_UP-vs-banker's
cannot diverge here by construction.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from c4_5decisiontreebasedonmapreduce_spark.operators import packing as PK
from c4_5decisiontreebasedonmapreduce_spark.operators import text as TX

# newline-heavy alphabet: the interesting structure is segmentation,
# not token variety
doc_text = st.text(alphabet=" ab\n\t", max_size=80)
corpora = st.lists(doc_text, min_size=1, max_size=6)


def _segs(text: str, sep: str) -> list:
    return [t for t in (x.strip(" ") for x in text.split(sep)) if t != ""]


def _ref_signals(text: str) -> tuple:
    lines = _segs(text, "\n")
    paras = _segs(text, "\n\n")
    n_l, nd_l = len(lines), len(set(lines))
    chars = sum(len(s) for s in lines)
    dchars = sum(len(s) for s in set(lines))
    n_p, nd_p = len(paras), len(set(paras))
    lf = round((n_l - nd_l) / n_l, 6) if n_l else 0.0
    cf = round((chars - dchars) / chars, 6) if chars else 0.0
    pf = round((n_p - nd_p) / n_p, 6) if n_p else 0.0
    return (n_l, lf, cf, n_p, pf, lf <= 0.30 and cf <= 0.20 and pf <= 0.30)


@settings(max_examples=8, deadline=None)
@given(corpora)
def test_repetition_signals_match_python_reference(spark, texts):
    d = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (
            r.n_lines,
            r.dup_line_frac,
            r.dup_line_char_frac,
            r.n_paras,
            r.dup_para_frac,
            r.keep,
        )
        for r in TX.repetition_signals(spark, "", d=d).collect()
    }
    want = {i: _ref_signals(t) for i, t in enumerate(texts)}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(corpora)
def test_pack_conserves_tokens_on_random_corpora(spark, texts):
    """Packing invariants on arbitrary (mostly degenerate) documents:
    total packed tokens equal the corpus token count, every non-final
    window per shard holds exactly SEQ_LEN tokens, and token-less
    documents vanish."""
    import collections
    import re

    d = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    packed = PK.pack(d, seq_len=7, n_shards=4).collect()
    total = sum(
        len([t for t in re.split(r"[^a-z0-9]+", x.lower()) if t])
        for x in texts
    )
    assert sum(r.n_tokens for r in packed) == total
    last = collections.defaultdict(int)
    for r in packed:
        last[r.shard] = max(last[r.shard], r.chunk_id)
    assert all(
        r.n_tokens == 7 for r in packed if r.chunk_id < last[r.shard]
    )
