"""Native C++ kernels vs numpy oracle parity."""
import numpy as np
import pytest

from mm_distillnet_tpu.utils import native
from mm_distillnet_tpu.utils.metrics import (get_batch_central_distances,
                                             get_batch_statistics)


pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native lib unavailable')


def _random_preds_targets(rng, n_pred=20, n_t=5):
    ctr = rng.uniform(20, 100, (n_pred, 2))
    wh = rng.uniform(5, 40, (n_pred, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1)
    scores = rng.uniform(0, 1, (n_pred, 1))
    labels = rng.integers(0, 3, (n_pred, 1)).astype(float)
    preds = np.concatenate([boxes, scores, labels], 1).astype(np.float32)
    order = np.argsort(-preds[:, 4], kind='stable')
    preds = preds[order]
    tctr = rng.uniform(20, 100, (n_t, 2))
    twh = rng.uniform(5, 40, (n_t, 2))
    tboxes = np.concatenate([tctr - twh / 2, tctr + twh / 2], 1)
    tlabels = rng.integers(0, 3, (n_t, 1)).astype(float)
    targets = np.concatenate([tboxes, tlabels], 1).astype(np.float32)
    return preds, targets


def _py_batch_stats(preds, targets, thr):
    """Force the pure-python path by monkeypatching availability off."""
    import mm_distillnet_tpu.utils.native as nat
    saved = nat.available
    nat.available = lambda: False
    try:
        return get_batch_statistics([preds.tolist()], [targets.tolist()], thr)
    finally:
        nat.available = saved


def test_native_nms_matches_numpy():
    rng = np.random.default_rng(0)
    preds, _ = _random_preds_targets(rng, 64, 1)
    boxes, scores = preds[:, :4], preds[:, 4]
    got = native.nms(boxes, scores, 0.5)
    want = native._np_nms(boxes, scores, 0.5)
    assert list(got) == list(want)


@pytest.mark.parametrize('seed', range(5))
def test_native_batch_statistics_matches_python(seed):
    rng = np.random.default_rng(seed)
    preds, targets = _random_preds_targets(rng)
    for thr in (0.3, 0.5, 0.75):
        native_out = get_batch_statistics([preds.tolist()],
                                          [targets.tolist()], thr)
        py_out = _py_batch_stats(preds, targets, thr)
        np.testing.assert_array_equal(native_out[0][0], py_out[0][0])


@pytest.mark.parametrize('seed', range(5))
def test_native_central_distances_matches_python(seed):
    rng = np.random.default_rng(seed + 10)
    preds, targets = _random_preds_targets(rng)
    got = native.central_distances(preds, targets)
    cdx, cdy = get_batch_central_distances([preds.tolist()],
                                           [targets.tolist()], 1.0, 1.0)
    np.testing.assert_allclose(got[0], cdx[0], rtol=1e-5)
    np.testing.assert_allclose(got[1], cdy[0], rtol=1e-5)


def test_prediction_statistics_miner():
    from mm_distillnet_tpu.utils.statistics import \
        collect_prediction_statistics
    teacher = {'drive_day/0001': np.array([[10, 10, 50, 50, 6],
                                           [60, 60, 90, 90, 6]], float),
               'drive_night/0002': np.array([[5, 5, 25, 25, 6]], float)}
    student = {'drive_day/0001': np.array([[11, 11, 49, 49, 0.9, 6],
                                           [200, 200, 240, 230, 0.4, 6]],
                                          float)}
    df = collect_prediction_statistics(student, teacher)
    assert len(df) == 2
    day = df[df['id'] == 'drive_day/0001'].iloc[0]
    assert day['missing_bboxes'] == 1 and day['excess_bboxes'] == 1
    night = df[df['id'] == 'drive_night/0002'].iloc[0]
    assert night['predominating_area_missing'] == 'ALL'
    assert bool(night['is_night'])
