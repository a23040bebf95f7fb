"""NMS and post-processing tests vs a numpy greedy-NMS oracle."""
import jax.numpy as jnp
import numpy as np

from mm_distillnet_tpu.ops.anchors import anchor_table
from mm_distillnet_tpu.ops.boxes import decode_boxes, clip_boxes
from mm_distillnet_tpu.ops.nms import batched_class_nms_fixed, nms_fixed
from mm_distillnet_tpu.ops.postprocess import (class_validity_table,
                                               detections_to_labels,
                                               postprocess_detections)


def np_greedy_nms(boxes, scores, iou_thr):
    """Oracle: classic greedy NMS, descending-score order."""
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / np.clip(areas[i] + areas - inter, 1e-8, None)
        suppressed |= iou > iou_thr
        suppressed[i] = True  # mark processed, already kept
    return keep


def test_nms_fixed_matches_oracle():
    rng = np.random.default_rng(0)
    n = 64
    ctr = rng.uniform(20, 100, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    valid = np.ones(n, bool)
    idx, kscores, out_valid = nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, n)
    got = np.asarray(idx)[np.asarray(out_valid)]
    want = np_greedy_nms(boxes, scores, 0.5)
    assert list(got) == list(want)


def test_nms_respects_validity_mask():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.array([False, True, True])
    idx, _, out_valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(valid), 0.5, 3)
    kept = list(np.asarray(idx)[np.asarray(out_valid)])
    assert kept == [1, 2]  # the invalid highest-score box is ignored


def test_batched_class_nms_keeps_cross_class_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 1], np.int32)
    valid = np.ones(2, bool)
    _, _, out_valid = batched_class_nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid), 0.5, 2, coord_bound=100.0)
    assert int(np.asarray(out_valid).sum()) == 2  # different class: both kept


def test_postprocess_pipeline_recovers_planted_box():
    size = 128
    anchors = anchor_table(size)
    n, c = anchors.shape[0], 20
    cls = np.full((1, n, c), 0.01, np.float32)
    reg = np.zeros((1, n, 4), np.float32)
    # plant a confident car (class 6) on anchor 100 with zero deltas
    cls[0, 100, 6] = 0.95
    table = class_validity_table(c, valid_prediction_ids=[6])
    dets = postprocess_detections(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(table), image_size=size, conf_threshold=0.3,
        nms_threshold=0.5, num_candidates=32, max_detections=8)
    valid = np.asarray(dets.valid[0])
    assert valid.sum() == 1
    a = anchors[100]
    expect = np.array([max(a[1], 0), max(a[0], 0),
                       min(a[3], size), min(a[2], size)])
    np.testing.assert_allclose(np.asarray(dets.boxes[0][valid])[0], expect,
                               atol=1e-3)
    assert int(np.asarray(dets.classes[0][valid])[0]) == 6
    # conversion to padded labels
    pred_to_label = np.arange(c, dtype=np.int32)
    labels = detections_to_labels(dets, jnp.asarray(pred_to_label), size)
    lab = np.asarray(labels[0])
    assert lab.shape == (8, 6)
    assert lab[0, 5] == 6 and (lab[1:, 5] == -1).all()


def test_postprocess_approx_topk_recovers_exact_detections():
    """approx=True (approx_max_k candidate selection, recall_target 0.99)
    must recover at least 90% of the exact path's detections on sparse
    real-ish scores — on sparse inputs (few above-threshold anchors) the
    partial reduction typically recovers all of them."""
    size = 128
    anchors = anchor_table(size)
    n, c = anchors.shape[0], 20
    rng = np.random.default_rng(21)
    cls = rng.uniform(0.0, 0.25, size=(2, n, c)).astype(np.float32)
    # plant 12 confident detections per image on random anchors
    for b in range(2):
        for a in rng.choice(n, 12, replace=False):
            cls[b, a, 6] = rng.uniform(0.5, 0.99)
    reg = np.zeros((2, n, 4), np.float32)
    table = class_validity_table(c, valid_prediction_ids=[6])
    kwargs = dict(image_size=size, conf_threshold=0.3, nms_threshold=0.5,
                  num_candidates=64, max_detections=16)
    exact = postprocess_detections(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(table), **kwargs)
    approx = postprocess_detections(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(table), approx=True, **kwargs)
    for b in range(2):
        want = {tuple(np.round(r, 3)) for r, v in
                zip(np.asarray(exact.boxes[b]), np.asarray(exact.valid[b]))
                if v}
        got = {tuple(np.round(r, 3)) for r, v in
               zip(np.asarray(approx.boxes[b]), np.asarray(approx.valid[b]))
               if v}
        assert want, 'exact path found nothing — test setup broken'
        recall = len(want & got) / len(want)
        assert recall >= 0.9, (recall, b)


def test_postprocess_f32_sort_is_bit_identical_to_int_sort():
    """The round-5 default exact selection (order-preserving bias+bitcast,
    top_k over f32) must produce BIT-IDENTICAL detections to the int32
    top_k it replaced (int_topk=True), including tie handling — dense
    random scores with deliberate duplicated values."""
    size = 128
    anchors = anchor_table(size)
    n, c = anchors.shape[0], 20
    rng = np.random.default_rng(5)
    cls = rng.uniform(0.0, 1.0, size=(2, n, c)).astype(np.float32)
    cls[0, 100:200] = cls[0, 300:400]  # exact duplicate packed values
    reg = rng.normal(0, 0.1, size=(2, n, 4)).astype(np.float32)
    table = class_validity_table(c, valid_prediction_ids=list(range(c)))
    kwargs = dict(image_size=size, conf_threshold=0.3, nms_threshold=0.5,
                  num_candidates=64, max_detections=16)
    f32 = postprocess_detections(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(table), **kwargs)
    i32 = postprocess_detections(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(table), int_topk=True, **kwargs)
    for a, b in zip(f32, i32):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_postprocess_approx_topk_low_conf_threshold():
    """conf_threshold < 2^-6 used to pack survivors to int32 values below
    2^23, whose f32 bitcast is SUBNORMAL — flushed to zero inside the
    TPU's approx_max_k, silently dropping them. The +2^23 bias keeps every
    survivor a normal float; this pins the low-threshold recall."""
    size = 128
    anchors = anchor_table(size)
    n, c = anchors.shape[0], 20
    rng = np.random.default_rng(7)
    cls = np.zeros((1, n, c), np.float32)
    # every planted score is BELOW 2^-6 = 0.015625 (the subnormal band)
    for a in rng.choice(n, 12, replace=False):
        cls[0, a, 6] = rng.uniform(0.002, 0.012)
    reg = np.zeros((1, n, 4), np.float32)
    table = class_validity_table(c, valid_prediction_ids=[6])
    kwargs = dict(image_size=size, conf_threshold=0.001, nms_threshold=0.5,
                  num_candidates=64, max_detections=16)
    exact = postprocess_detections(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(table), **kwargs)
    approx = postprocess_detections(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(table), approx=True, **kwargs)
    want = {tuple(np.round(r, 3)) for r, v in
            zip(np.asarray(exact.boxes[0]), np.asarray(exact.valid[0]))
            if v}
    got = {tuple(np.round(r, 3)) for r, v in
           zip(np.asarray(approx.boxes[0]), np.asarray(approx.valid[0]))
           if v}
    assert want, 'exact path found nothing — test setup broken'
    recall = len(want & got) / len(want)
    assert recall >= 0.9, recall
    # scores must round-trip through the biased packing unchanged
    exact_scores = sorted(float(s) for s, v in
                          zip(exact.scores[0], exact.valid[0]) if v)
    approx_scores = sorted(float(s) for s, v in
                           zip(approx.scores[0], approx.valid[0]) if v)
    np.testing.assert_allclose(approx_scores, exact_scores, atol=1e-7)


def test_postprocess_high_class_filtered_out():
    size = 128
    anchors = anchor_table(size)
    n, c = anchors.shape[0], 20
    cls = np.full((1, n, c), 0.01, np.float32)
    cls[0, 50, 3] = 0.9  # class 3 not in valid set
    table = class_validity_table(c, valid_prediction_ids=[6])
    dets = postprocess_detections(
        jnp.asarray(cls), jnp.asarray(np.zeros((1, n, 4), np.float32)),
        jnp.asarray(anchors), jnp.asarray(table), image_size=size,
        num_candidates=32, max_detections=8)
    assert int(np.asarray(dets.valid).sum()) == 0


def test_decode_clip_roundtrip():
    anchors = jnp.asarray(anchor_table(128)[:10])
    reg = jnp.zeros((1, 10, 4))
    boxes = decode_boxes(anchors[None], reg)
    # zero deltas -> boxes == anchors in xyxy order
    np.testing.assert_allclose(np.asarray(boxes[0, :, 0]),
                               np.asarray(anchors[:, 1]), atol=1e-5)
    clipped = clip_boxes(boxes, 128.0)
    assert float(clipped.min()) >= 0.0
    assert float(jnp.max(clipped[..., 2:])) <= 128.0
