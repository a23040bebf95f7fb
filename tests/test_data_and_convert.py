"""Data pipeline, registry, StereoSoundNet, and weight-converter tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from mm_distillnet_tpu.config import default_config
from mm_distillnet_tpu.convert.torch_weights import (_torch_key_for,
                                                     convert_state_dict,
                                                     strip_wrapper_prefixes)
from mm_distillnet_tpu.data.base import (build_valid_classes_dict,
                                         prediction_to_label_lut,
                                         valid_prediction_ids)
from mm_distillnet_tpu.data.loader import DataLoader, collate
from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
from mm_distillnet_tpu.data.transforms import Normalizer, Resizer
from mm_distillnet_tpu.models.efficientdet import EfficientDet
from .helpers import fast_init
from mm_distillnet_tpu.models.stereosoundnet import (StereoSoundNet,
                                                     space_to_depth_2x)


def test_valid_classes_dict_car_only():
    config = default_config()
    d = build_valid_classes_dict(
        ('aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus', 'car'),
        config)
    assert d['labels_txt2i'] == {'car': 6}
    assert d['predictions_txt2i'] == {'car': 6}
    lut = prediction_to_label_lut(d, 20)
    assert lut[6] == 6 and lut[0] == -1
    assert valid_prediction_ids(d) == [6]


def test_synthetic_dataset_and_loader():
    config = default_config(image_size=128, synthetic_size=8)
    ds = SyntheticMultimodal(config, 'train')
    assert len(ds) == 8
    s = ds[0]
    assert s['rgb'].shape == (128, 128, 3)
    assert s['thermal'].shape == (128, 128, 1)
    # compact audio ingest is the default since round 5 (80 mel rows,
    # time axis stretched on host, mel axis stretched on device)
    assert s['audio'].shape == (80, 128, 8)
    assert s['label'].shape[1] == 5
    full = SyntheticMultimodal(
        default_config(image_size=128, synthetic_size=8,
                       device_audio_resize='False'), 'train')[0]
    assert full['audio'].shape == (128, 128, 8)

    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, max_gt=16)
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b['rgb'].shape == (4, 128, 128, 3)
    assert b['label'].shape == (4, 16, 5)
    # padding rows are -1 labeled
    assert (b['label'][..., 4] == -1).any()


def test_loader_process_sharding_partitions_indices():
    config = default_config(image_size=128, synthetic_size=16)
    ds = SyntheticMultimodal(config, 'train')
    ids = set()
    for rank in range(4):
        dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                        process_index=rank, process_count=4)
        for b in dl:
            ids.update(b['id'])
    assert len(ids) == 16  # disjoint cover


def test_transforms_resizer_semantics():
    sample = {'rgb': np.random.rand(100, 200, 3).astype(np.float32),
              'thermal': np.random.rand(100, 200).astype(np.float32),
              'depth': np.random.rand(100, 200, 3).astype(np.float32),
              'audio': np.random.rand(80, 172, 8).astype(np.float32),
              'label': np.array([[10, 10, 50, 50, 6]], np.float32),
              'id': 'x'}
    out = Resizer(common_size=128)(sample)
    assert out['rgb'].shape == (128, 128, 3)
    # aspect-preserving: 100x200 -> 64x128, zero pad below
    assert np.all(out['rgb'][64:] == 0)
    assert out['audio'].shape == (128, 128, 8)  # full stretch
    np.testing.assert_allclose(out['label'][0, :4],
                               [10 * 0.64, 10 * 0.64, 50 * 0.64, 50 * 0.64])


def test_torch_key_translation_exemplars():
    """Exemplar torch keys verified against the reference module tree
    (src/YetAnotherEfficientDet.py, src/YetAnotherEfficientNet.py)."""
    cases = [
        (('backbone_net', '_conv_stem', 'kernel'), 'params',
         'backbone_net.model._conv_stem.conv.weight'),
        (('backbone_net', '_bn0', 'scale'), 'params',
         'backbone_net.model._bn0.weight'),
        (('backbone_net', '_blocks_3', '_depthwise_conv', 'kernel'), 'params',
         'backbone_net.model._blocks.3._depthwise_conv.conv.weight'),
        (('backbone_net', '_blocks_0', '_bn1', 'mean'), 'batch_stats',
         'backbone_net.model._blocks.0._bn1.running_mean'),
        (('bifpn', 'cell_0', 'p6_w1'), 'params', 'bifpn.0.p6_w1'),
        (('bifpn', 'cell_2', 'conv6_up', 'depthwise_conv', 'kernel'),
         'params', 'bifpn.2.conv6_up.depthwise_conv.conv.weight'),
        (('bifpn', 'cell_0', 'p5_down_channel', 'conv', 'kernel'), 'params',
         'bifpn.0.p5_down_channel.0.conv.weight'),
        (('bifpn', 'cell_0', 'p5_down_channel', 'bn', 'var'), 'batch_stats',
         'bifpn.0.p5_down_channel.1.running_var'),
        (('bifpn', 'cell_0', 'p5_to_p6', 'conv', 'bias'), 'params',
         'bifpn.0.p5_to_p6.0.conv.bias'),
        (('regressor', 'tower', 'conv_1_depthwise', 'kernel'), 'params',
         'regressor.conv_list.1.depthwise_conv.conv.weight'),
        (('regressor', 'tower', 'bn_4_2', 'mean'), 'batch_stats',
         'regressor.bn_list.4.2.running_mean'),
        (('classifier', 'tower', 'header_pointwise', 'bias'), 'params',
         'classifier.header.pointwise_conv.conv.bias'),
    ]
    for path, coll, want in cases:
        assert _torch_key_for(path, coll) == want, (path, want)


def test_convert_full_model_roundtrip():
    """Every flax path of a D2 model must resolve to a torch key; a synthetic
    state dict built from those keys converts with zero missing paths."""
    model = EfficientDet(num_classes=4, compound_coef=2, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3))
    variables = jax.tree_util.tree_map(np.asarray,
                                       fast_init(model, 0, x))
    # build torch-side tensors by inverting the conversion transpose
    sd = {}
    for coll in variables:
        flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for path, leaf in flat:
            keys = tuple(p.key for p in path)
            tkey = _torch_key_for(keys, coll)
            arr = np.asarray(leaf)
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            assert tkey not in sd, f'duplicate torch key {tkey}'
            sd[tkey] = torch.from_numpy(np.ascontiguousarray(arr))
    converted, report = convert_state_dict(sd, variables, strict=True)
    assert not report['missing']
    assert not report['unused'], report['unused'][:5]
    # numerical identity through the round trip
    for coll in variables:
        a = jax.tree_util.tree_leaves(variables[coll])
        b = jax.tree_util.tree_leaves(converted[coll])
        assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_strip_wrapper_prefixes():
    sd = {'module.backbone_net.x': 1, 'student_model.bifpn.y': 2}
    out = strip_wrapper_prefixes(sd)
    assert set(out) == {'backbone_net.x', 'bifpn.y'}


def test_space_to_depth_matches_torch_reorg():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    ours = np.asarray(space_to_depth_2x(jnp.asarray(x)))
    t = torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()
    b, c, h, w = t.shape
    # exact reference sequence (src/StereoSoundNet.py:180-193)
    t2 = t.view(b, c // 4, h, 2, w, 2).permute(0, 3, 5, 1, 2, 4)
    t2 = t2.contiguous().view(b, -1, h // 2, w // 2)
    want = t2.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, want)


def test_stereosoundnet_shapes():
    m = StereoSoundNet(num_classes=20, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 8))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out, features = m.apply(v, x)
    # 5 maxpools -> stride 32
    assert out.shape == (1, 4, 4, 5 * 25)
    assert features.shape == (1, 4, 4, 1024)


def test_torch_checkpoint_tar_format_roundtrip(tmp_path):
    """The reference saves {'epoch', 'state_dict', 'optimizer', ...} dicts
    (train_methods.py:1239-1254) with DataParallel 'module.' prefixes;
    maybe_load_checkpoint must unwrap and convert them."""
    from mm_distillnet_tpu.models.registry import maybe_load_checkpoint
    model = EfficientDet(num_classes=4, compound_coef=0, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3))
    variables = jax.tree_util.tree_map(np.asarray, fast_init(model, 0, x))
    from mm_distillnet_tpu.convert.torch_weights import _torch_key_for
    sd = {}
    for coll in variables:
        flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for path, leaf in flat:
            keys = tuple(p.key for p in path)
            arr = np.asarray(leaf) + 1.0  # make values distinguishable
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            sd['module.' + _torch_key_for(keys, coll)] = \
                torch.from_numpy(np.ascontiguousarray(arr))
    ckpt = {'epoch': 7, 'state_dict': sd, 'best_loss': 1.0,
            'optimizer': {'dummy': 1}}
    path = str(tmp_path / 'checkpoint.0.pth.tar')
    torch.save(ckpt, path)
    loaded = maybe_load_checkpoint(path, variables)
    a = jax.tree_util.tree_leaves(loaded['params'])[0]
    b = jax.tree_util.tree_leaves(variables['params'])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b) + 1.0)


def test_refine_ids_prunes_by_teacher_confidence(tmp_path):
    """BaseDataset.refine_ids: runs the teacher over the dataset, caches a
    predictions CSV, and keeps only confidently-predicted frames."""
    import os
    from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
    config = default_config(image_size=128, synthetic_size=4,
                            data_path=str(tmp_path), use_labels='False',
                            nms_candidates=64, max_detections=8,
                            valid_labels=','.join(
                                ['car', 'person', 'bus']))
    ds = SyntheticMultimodal(config, 'train')
    model = EfficientDet(num_classes=20, compound_coef=-1,
                         dtype=jnp.float32)
    v = fast_init(model, 0, jnp.zeros((1, 128, 128, 3)))
    n_before = len(ds)
    ds.refine_ids((model, v), config)
    csv = os.path.join(str(tmp_path),
                       'YetAnotherEfficientDet_D2_train_all_predictions.csv')
    assert os.path.exists(csv)
    assert len(ds) <= n_before
    # use_labels=True path: keep frames with >1 valid label
    config['use_labels'] = 'True'
    ds2 = SyntheticMultimodal(config, 'train')
    ds2.use_labels = True
    ds2.refine_ids((model, v), config)
    assert all((ds2[i]['label'][:, 4] != -1).sum() > 1
               for i in range(len(ds2))) or len(ds2) == 0
