"""QCF flag algebra (qcf.py:637-696 decision rules)."""

import numpy as np
import pandas as pd

from diive_ray.stages.qcf import qcf_frame


def test_qcf_decision_rules():
    df = pd.DataFrame(
        {
            "v": [1.0] * 6,
            "FLAG_v_A_TEST": [0, 1, 2, 1, 1, 0],
            "FLAG_v_B_TEST": [0, 0, 0, 1, 1, 2],
            "FLAG_v_C_TEST": [0, 0, 0, 1, 1, 0],
            "FLAG_v_D_TEST": [0, 0, 0, 0, 1, 0],
        }
    )
    out = qcf_frame(df)
    # row0: all clean -> 0
    # row1: one soft -> 1
    # row2: one hard -> 2
    # row3: three soft, no hard -> 1
    # row4: four soft -> 2
    # row5: one hard -> 2
    assert out["FLAG_QCF_TEST"].tolist() == [0, 1, 2, 1, 2, 2]
    assert out["SUM_HARDFLAGS"].tolist() == [0, 0, 2, 0, 0, 2]
    assert out["SUM_SOFTFLAGS"].tolist() == [0, 1, 0, 3, 4, 0]


def test_qcf_ignores_non_flag_columns():
    df = pd.DataFrame({"v": [1.0], "FLAG_v_A_TEST": [2], "other": [9]})
    out = qcf_frame(df)
    assert out["FLAG_QCF_TEST"].tolist() == [2]
