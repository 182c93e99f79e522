"""normalize_text (functions/text.py) — Arrow-kernel vs DuckDB parity
on curated unicode, plus idempotence. The registry query only sees the
corpus text; this pins the unicode edge cases the corpus may lack."""

import duckdb
import pyarrow as pa


CASES = [
    "  Héllo\t\nWORLD  ",
    "école",            # NFC: e + combining acute -> é
    "ÅNGSTRÖM",   # Å and ö from combining marks
    "ß sharp",                # no uppercase mapping issues
    "tabs\t\tand\nnewlines\r\f\vmix",
    "",
    "   ",
    "already normal",
]


def _duck(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, ?)" for i in range(len(texts))) + ") v(i, s)",
                list(texts))
    return [r[0] for r in con.execute(
        "SELECT trim(regexp_replace(lower(nfc_normalize(s)),"
        " '[ ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || ']+',"
        " ' ', 'g'), ' ') FROM t ORDER BY i").fetchall()]


def test_normalize_matches_duckdb_on_unicode():
    from diive_ray.functions.text import normalize_text

    got = normalize_text(pa.array(CASES)).to_pylist()
    assert got == _duck(CASES)


def test_normalize_idempotent_and_null_safe():
    from diive_ray.functions.text import normalize_text

    once = normalize_text(pa.array(CASES + [None]))
    twice = normalize_text(once)
    assert once.to_pylist() == twice.to_pylist()
    assert once.to_pylist()[-1] is None


def test_normalized_dedup_merges_variants(ray_session):
    """Case / whitespace / unicode-form variants of one text collapse
    to the lowest doc_id through normalize + exact_dedup."""
    import pandas as pd
    import ray.data as rd

    from diive_ray.functions.text import normalize_text
    from diive_ray.stages.dedup import exact_dedup

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "The Quick   Brown Fox",
            "the quick brown fox",        # case+ws variant of 1
            "the\tquick\nbrown fox  ",    # ws variant of 1
            "\u00e9cole du soir",       # precomposed form
            "e\u0301cole du soir",      # NFD variant of 4
            "something else entirely",
        ],
    })

    def norm(t):
        return pa.table({"doc_id": t["doc_id"], "text": normalize_text(t["text"])})

    kept = exact_dedup(
        rd.from_pandas(df).repartition(3).map_batches(
            norm, batch_format="pyarrow", zero_copy_batch=True)
    ).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [1, 4, 6]
