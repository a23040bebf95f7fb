"""PyTorch .pth -> flax variables converter for EfficientDet checkpoints.

One-time bridge for the reference's shipped teacher/student checkpoints
(reference src/utils/utils.py:441-590 model registry; checkpoint format is a
torch state_dict, sometimes nested under 'state_dict'/'model' and prefixed
with 'module.'/'student_model.' by DataParallel wrappers — the prefix
cleanup mirrors filter_model_dict, src/utils/utils.py:327-411).

The key translation is derived mechanically from our flax module tree so it
can never drift from the model definition: every flax parameter path maps to
exactly one torch key; unmapped torch keys are reported.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np


def strip_wrapper_prefixes(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Unwrap checkpoint containers and strip parallel-wrapper prefixes."""
    for key in ('state_dict', 'model', 'model_state_dict'):
        if key in state_dict and isinstance(state_dict[key], dict):
            state_dict = state_dict[key]
    out = {}
    for k, v in state_dict.items():
        for prefix in ('module.', 'student_model.', 'model.module.'):
            if k.startswith(prefix):
                k = k[len(prefix):]
        out[k] = v
    return out


def _torch_key_for(path: Tuple[str, ...], collection: str) -> str:
    """Translate a flax variable path to the reference torch key."""
    parts = list(path)
    leaf = parts.pop()
    if collection == 'params':
        leaf_map = {'kernel': 'weight', 'bias': 'bias',
                    'scale': 'weight'}
    else:
        leaf_map = {'mean': 'running_mean', 'var': 'running_var'}
    # fast-attention weights are bare parameters named p*_w*
    if re.fullmatch(r'p\d_w\d', leaf):
        segs = _module_path(parts)
        return '.'.join(segs + [leaf])
    tleaf = leaf_map[leaf]
    segs = _module_path(parts)
    return '.'.join(segs) + '.' + tleaf


def _module_path(parts: List[str]) -> List[str]:
    segs: List[str] = []
    i = 0
    root = parts[0] if parts else ''
    while i < len(parts):
        p = parts[i]
        if p == 'backbone_net':
            segs += ['backbone_net', 'model']
        elif m := re.fullmatch(r'backbone_net_(\w+)', p):
            # generator per-modality backbone (reference
            # YetAnotherEfficientDet_generator.py:634-641)
            segs += ['model_backbones', m.group(1), 'model']
        elif m := re.fullmatch(r'bifpn_(\w+)', p):
            segs += ['model_necks', m.group(1)]
        elif m := re.fullmatch(r'_blocks_(\d+)', p):
            segs += ['_blocks', m.group(1)]
        elif m := re.fullmatch(r'cell_(\d+)', p):
            segs.append(m.group(1))
        elif p == 'tower':
            pass  # flax-only grouping level
        elif m := re.fullmatch(r'conv_(\d+)_depthwise', p):
            segs += ['conv_list', m.group(1), 'depthwise_conv', 'conv']
        elif m := re.fullmatch(r'conv_(\d+)_pointwise', p):
            segs += ['conv_list', m.group(1), 'pointwise_conv', 'conv']
        elif p == 'header_depthwise':
            segs += ['header', 'depthwise_conv', 'conv']
        elif p == 'header_pointwise':
            segs += ['header', 'pointwise_conv', 'conv']
        elif m := re.fullmatch(r'bn_(\d+)_(\d+)', p):
            segs += ['bn_list', m.group(1), m.group(2)]
        elif p in ('p3_down_channel', 'p4_down_channel', 'p5_down_channel',
                   'p4_down_channel_2', 'p5_down_channel_2', 'p5_to_p6'):
            # Sequential(conv, bn[, pool]) in torch: conv -> .0, bn -> .1
            nxt = parts[i + 1]
            segs += [p, '0' if nxt == 'conv' else '1']
            if nxt == 'bn':
                i += 1  # consumed
            else:
                segs += ['conv']
                i += 1
        elif p == 'depthwise_conv':
            segs += ['depthwise_conv', 'conv']
        elif p == 'pointwise_conv':
            segs += ['pointwise_conv', 'conv']
        elif p == 'conv':  # ConvSame wrapper
            segs += ['conv']
        elif p == 'bn':
            segs += ['bn']
        elif re.fullmatch(r'_conv_stem|_expand_conv|_depthwise_conv|'
                          r'_se_reduce|_se_expand|_project_conv', p):
            segs += [p, 'conv']
        elif re.fullmatch(r'_bn\d', p):
            segs += [p]
        else:
            segs.append(p)
        i += 1
    return segs


_MODALITIES = ('audio', 'thermal', 'depth', 'rgb')


def _alternate_keys(tkey: str) -> List[str]:
    """Cross-format fallbacks mirroring the reference's filter_model_dict
    prefix remapping (utils.py:342-357): load a plain-EfficientDet
    checkpoint into generator per-modality slots, or a generator
    checkpoint's modality slots into a plain model."""
    alts = []
    if tkey.startswith('model_backbones.'):
        alts.append(re.sub(r'^model_backbones\.\w+\.', 'backbone_net.',
                           tkey))
    elif tkey.startswith('model_necks.'):
        alts.append(re.sub(r'^model_necks\.\w+\.', 'bifpn.', tkey))
    elif tkey.startswith('backbone_net.'):
        alts += [tkey.replace('backbone_net.', f'model_backbones.{m}.', 1)
                 for m in _MODALITIES]
    elif tkey.startswith('bifpn.'):
        alts += [tkey.replace('bifpn.', f'model_necks.{m}.', 1)
                 for m in _MODALITIES]
    return alts


def _to_flax_tensor(torch_tensor, flax_shape) -> np.ndarray:
    arr = np.asarray(torch_tensor.detach().cpu().numpy()
                     if hasattr(torch_tensor, 'detach') else torch_tensor)
    if arr.ndim == 4:  # conv OIHW -> HWIO
        arr = arr.transpose(2, 3, 1, 0)
    if tuple(arr.shape) != tuple(flax_shape):
        raise ValueError(f'shape mismatch: torch {arr.shape} vs flax '
                         f'{tuple(flax_shape)}')
    return arr


def convert_state_dict(state_dict: Dict[str, Any], flax_variables,
                       strict: bool = True):
    """Fill a flax variables tree (from model.init) with torch weights.

    Returns (variables, report) where report lists unused torch keys and
    unmatched flax paths.
    """
    import jax

    sd = strip_wrapper_prefixes(state_dict)
    used = set()
    missing = []

    def fill(collection: str, tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for path, leaf in flat:
            keys = tuple(getattr(p, 'key', getattr(p, 'name', str(p)))
                         for p in path)
            tkey = _torch_key_for(keys, collection)
            # size-mismatched keys are skipped like the reference's
            # filter_model_dict (it only copies on v.size() equality) —
            # e.g. generator heads are wider than plain-model heads
            match = next(
                (a for a in [tkey] + _alternate_keys(tkey)
                 if a in sd and np.asarray(sd[a]).size == leaf.size), None)
            if match is not None:
                used.add(match)
                val = _to_flax_tensor(sd[match], leaf.shape)
            else:
                missing.append((collection,) + keys)
                val = np.asarray(leaf)
            out[keys] = val
        return out

    filled = {}
    for coll in flax_variables:
        flat_vals = fill(coll, flax_variables[coll])
        treedef = jax.tree_util.tree_structure(flax_variables[coll])
        leaves = jax.tree_util.tree_flatten_with_path(
            flax_variables[coll])[0]
        ordered = [flat_vals[tuple(getattr(p, 'key', getattr(p, 'name',
                                                             str(p)))
                                   for p in path)]
                   for path, _ in leaves]
        filled[coll] = jax.tree_util.tree_unflatten(treedef, ordered)

    unused = [k for k in sd
              if k not in used and not k.startswith(('anchors.',))
              and 'num_batches_tracked' not in k
              and not k.startswith(('_conv_head', '_bn1.', '_fc',
                                    'backbone_net.model._conv_head',
                                    'backbone_net.model._bn1.',
                                    'backbone_net.model._fc'))]
    report = {'missing': missing, 'unused': unused}
    if strict and missing:
        raise ValueError(f'unmatched flax paths: {missing[:10]} '
                         f'({len(missing)} total)')
    return filled, report


def load_torch_checkpoint(path: str, flax_variables, strict: bool = True):
    """torch.load a .pth and convert (CPU-only; torch is a conversion-time
    dependency, never on the TPU compute path)."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=False)
    return convert_state_dict(sd, flax_variables, strict=strict)
