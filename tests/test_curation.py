"""Composed curation pipeline (curation.curate_corpus)."""

from pyspark.sql import functions as F
import pytest

from metrique_spark.functions.cache import release
from metrique_spark.functions.curation import curate_corpus

# Heavy suite (>1 min serial): opt-in via `pytest -m slow` so the default
# `pytest tests/` finishes inside the driver's verify window (r14 shipped
# tests_ok:false purely because the ~1 h full suite was truncated). The
# per-round gate runs these explicitly; coverage is unchanged.
pytestmark = pytest.mark.slow



def _corpus(spark):
    """one language; fluent docs share a small vocabulary, junk docs use
    singleton tokens (low unigram logprob); plus one exact duplicate and
    one empty doc."""
    common = "the cat sat on the mat and the dog sat too"
    rows = [(i, f"{common} number {i % 3}", "en") for i in range(9)]
    rows += [(20 + i,
              " ".join(f"zz{i}w{j}" for j in range(12)), "en")
             for i in range(3)]                       # singleton-token junk
    rows.append((100, rows[0][1], "en"))              # exact dup of doc 0
    rows.append((101, "", "en"))                      # token-less
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string")


def test_curate_corpus_decisions(spark):
    out = curate_corpus(_corpus(spark), min_words=5, min_stopword_hits=0)
    rows = {r["doc_id"]: r for r in out.collect()}
    release(out)
    assert len(rows) == 14

    # exact duplicate: min-id keeps
    assert rows[0]["is_canonical"] is True
    assert rows[100]["is_canonical"] is False and not rows[100]["keep"]
    # token-less doc: no LM row -> tail, never kept
    assert rows[101]["n_tokens"] is None
    assert rows[101]["ppl_bucket"] == "tail" and not rows[101]["keep"]
    # keep implies every gate
    for r in rows.values():
        if r["keep"]:
            assert (r["gopher_pass"] and r["is_canonical"]
                    and r["ppl_bucket"] != "tail")
    # fluency ordering: every head score >= every tail score (same lang)
    head = [r["mean_logprob"] for r in rows.values()
            if r["ppl_bucket"] == "head"]
    tail = [r["mean_logprob"] for r in rows.values()
            if r["ppl_bucket"] == "tail" and r["mean_logprob"] is not None]
    assert head and tail and min(head) >= max(tail)
    # the singleton-token junk is in the tail, the fluent docs are not
    junk_buckets = {rows[20 + i]["ppl_bucket"] for i in range(3)}
    assert junk_buckets == {"tail"}
    assert any(rows[i]["keep"] for i in range(9))


def test_curate_corpus_gopher_gate_blocks_keep(spark):
    """with the strict word floor the short docs fail the gate and
    nothing is kept, buckets unchanged."""
    out = curate_corpus(_corpus(spark), min_words=50, min_stopword_hits=0)
    rows = out.collect()
    release(out)
    assert all(not r["keep"] for r in rows)
    # tie-heavy scores can collapse the middle tercile (b33 == b67);
    # head and tail always exist
    assert {"head", "tail"} <= {r["ppl_bucket"] for r in rows}
