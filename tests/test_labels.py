"""Class-merge and label-weight semantics vs. hand-computed oracles."""

import numpy as np

from tumseg.utils.labels import (
    CLASSES_8, CLASSES_18, LABEL2COLOR_8, LABEL2COLOR_18,
    label_weights, merge_to_8_classes, seg_label_to_cat,
)


def test_merge_rules_oracle():
    # every raw code 1..17 → expected 8-class label, from the merge rules at
    # reference sem_seg_training.py:159-169
    expected = {
        1: 0,   # wall
        2: 1,   # window
        3: 2,   # door
        4: None,  # balcony has no mapping (stays 4 → lut[-like] undefined)
        5: 3,   # molding
        6: 3,   # deco → molding
        7: 6,   # column
        8: 7,   # arch
        9: 0,   # drainpipe → wall
        10: 0,  # stairs → wall
        11: 5,  # ground surface → terrain
        12: 5,  # terrain
        13: 4,  # roof → other
        14: 1,  # blinds → window
        15: 0,  # outer ceiling surface → wall
        16: 4,  # interior → other
        17: 4,  # other
    }
    for raw, want in expected.items():
        if want is None:
            continue
        got = merge_to_8_classes(np.array([raw]))[0]
        assert got == want, (raw, got, want)


def test_merge_vectorized_matches_scalar():
    r = np.random.default_rng(0)
    raw = r.choice([1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17], 1000)
    merged = merge_to_8_classes(raw)
    assert merged.min() >= 0 and merged.max() <= 7


def test_merge_rejects_unmapped_codes():
    import pytest

    # 0 'total' and 4 'balcony' have no 8-class destination: fail loudly
    # instead of producing -1 labels (ADVICE r1 #3)
    for bad in (0, 4):
        with pytest.raises(ValueError, match=str(bad)):
            merge_to_8_classes(np.array([1, bad, 2]))
    with pytest.raises(ValueError, match="18"):
        merge_to_8_classes(np.array([18]))


def test_label_weights_formula():
    hist = np.array([100, 10, 1, 50], dtype=np.float64)
    w = label_weights(hist)
    norm = hist / hist.sum()
    np.testing.assert_allclose(w, np.power(norm.max() / norm, 1 / 3.0), rtol=1e-6)


def test_tables_shapes():
    assert len(CLASSES_18) == 18 and len(CLASSES_8) == 8
    assert set(LABEL2COLOR_8) == set(range(8))
    assert set(LABEL2COLOR_18) == set(range(18))
    cat = seg_label_to_cat(True)
    assert cat[0] == "wall" and cat[7] == "arch"
    cat18 = seg_label_to_cat(False)
    assert cat18[1] == "wall" and cat18[13] == "roof"
