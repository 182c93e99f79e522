"""Token-array equality verifier: fast stride-proof path == full
regeneration path, on clean and corrupted arrays."""

import numpy as np
import pyarrow as pa

from diive_ray.fixtures import gen_chunk, verify_tokens_batch


def test_verify_paths_agree_clean_and_corrupted():
    t = gen_chunk("s03", 1656633600000000, 0, 4000)
    a = verify_tokens_batch(t)
    b = verify_tokens_batch(t, full=True)
    assert a["rows_ok"][0].as_py() == b["rows_ok"][0].as_py() == t.num_rows

    toks = t["tokens"].to_pylist()
    toks[7][3] += 1                                   # mid-array
    toks[11][0] += 1                                  # first token
    toks[20] = [(x + 1) % 50257 for x in toks[20]]    # stride-preserving shift
    toks[30] = toks[30][:-1]                          # wrong length
    t2 = t.set_column(t.column_names.index("tokens"), "tokens", pa.array(toks, pa.list_(pa.int32())))
    f_fast = verify_tokens_batch(t2)
    f_full = verify_tokens_batch(t2, full=True)
    assert f_fast["rows_ok"][0].as_py() == f_full["rows_ok"][0].as_py() == t.num_rows - 4


def test_verify_handles_duplicate_rows():
    # duplicated timestamps carry '-d' doc_ids with n_tok+7: the idx
    # parse + per-row seeds must still verify them
    t = gen_chunk("s00", 1656633600000000, 990, 1020)
    r = verify_tokens_batch(t)
    assert r["rows_ok"][0].as_py() == t.num_rows
