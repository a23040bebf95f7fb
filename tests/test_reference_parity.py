"""End-to-end numerical parity against the actual PyTorch reference.

Builds the reference's YetAnotherEfficientDet-D2 (imported from
/root/reference at test time — never copied), randomizes its weights AND
BatchNorm running statistics, converts the state_dict through our
convert.torch_weights bridge, and compares the full forward pass
(classification, regression, anchors, BiFPN features) between frameworks.
This validates the entire numerical core at once: SAME padding, BN
semantics, block wiring, BiFPN fusion order, head reshapes, anchor layout
(SURVEY.md section 7 'minimum end-to-end slice').

Skipped when the reference checkout is unavailable.
"""
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = '/root/reference'

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference checkout unavailable')


def _install_torchvision_shim():
    """The reference imports torchvision.ops.boxes.nms at module import
    time; provide a minimal torch implementation (test-only)."""
    if 'torchvision' in sys.modules:
        return
    import torch

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True)
        keep = []
        suppressed = torch.zeros(len(boxes), dtype=torch.bool)
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            xx1 = torch.maximum(boxes[i, 0], boxes[:, 0])
            yy1 = torch.maximum(boxes[i, 1], boxes[:, 1])
            xx2 = torch.minimum(boxes[i, 2], boxes[:, 2])
            yy2 = torch.minimum(boxes[i, 3], boxes[:, 3])
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            iou = inter / (areas[i] + areas - inter + 1e-8)
            suppressed |= iou > iou_threshold
            suppressed[i] = True
        return torch.tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.long)
        offsets = idxs.to(boxes.dtype) * (boxes.max() + 1)
        return nms(boxes + offsets[:, None], scores, iou_threshold)

    tv = types.ModuleType('torchvision')
    ops = types.ModuleType('torchvision.ops')
    boxes_mod = types.ModuleType('torchvision.ops.boxes')
    boxes_mod.nms = nms
    boxes_mod.batched_nms = batched_nms
    ops.boxes = boxes_mod
    ops.nms = nms
    ops.batched_nms = batched_nms
    tv.ops = ops
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.ops'] = ops
    sys.modules['torchvision.ops.boxes'] = boxes_mod


@pytest.fixture(scope='module')
def reference_model():
    import torch
    _install_torchvision_shim()
    sys.path.insert(0, REFERENCE)
    from src.YetAnotherEfficientDet import YetAnotherEfficientDet
    torch.manual_seed(0)
    model = YetAnotherEfficientDet(num_classes=20, compound_coef=2,
                                   in_channels=3, load_weights=False)
    # randomize BN running stats so eval-mode BN is a real transformation
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.05)
    model.eval()
    return model


def test_full_forward_parity_with_reference(reference_model):
    import jax
    import jax.numpy as jnp
    import torch

    from mm_distillnet_tpu.convert.torch_weights import convert_state_dict
    from mm_distillnet_tpu.models.efficientdet import EfficientDet
    from mm_distillnet_tpu.ops.anchors import anchor_table

    size = 128
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, size, size, 3)).astype(np.float32)

    with torch.no_grad():
        (cls_t, reg_t, anchors_t), feats_t = reference_model(
            torch.from_numpy(x).permute(0, 3, 1, 2))

    model = EfficientDet(num_classes=20, compound_coef=2, dtype=jnp.float32)
    variables = jax.tree_util.tree_map(
        np.asarray, jax.jit(model.init)(jax.random.PRNGKey(0),
                                        jnp.asarray(x)))
    converted, report = convert_state_dict(reference_model.state_dict(),
                                           variables, strict=True)
    assert not report['missing']
    out = model.apply(converted, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(out.regression),
                               reg_t.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.classification),
                               cls_t.numpy(), rtol=1e-3, atol=2e-5)
    # anchors: ours is a module-level constant with the same table
    np.testing.assert_allclose(anchor_table(size), anchors_t.numpy()[0],
                               rtol=1e-5, atol=1e-3)
    # BiFPN features (NHWC vs NCHW)
    for ours, theirs in zip(out.features, feats_t):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.permute(0, 2, 3, 1).numpy(),
            rtol=1e-3, atol=2e-4)
