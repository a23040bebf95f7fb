"""Control experiment: supervised audio-input detector on synthetic frames.

Isolates phase B of the convergence proof: if the 8-channel audio model can
be GT-supervised to high AP, the audio modality/model path is sound and any
distillation shortfall comes from the pseudo-label target quality.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/mmdt_xla'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import scripts.convergence as C
from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
from mm_distillnet_tpu.train.trainer import train

EPOCHS = int(os.environ.get('DBG_EPOCHS', '400'))

args = C.parse_args(['--size', '256', '--batch', '8',
                     '--exp-name', 'convergence-audio-sup'])
cfg = C._config(args, num_epoches=EPOCHS, use_labels=True,
                student_input='audio', kd_loss='None',
                train_method='traditional',
                exp_name='convergence-audio-sup/model')
train_set = SyntheticMultimodal(cfg, 'train')
model = C._mk(9, 8, 256, 0)
state = train({}, model, cfg, train_set, None)
model = (model[0], C._recalibrate(model[0], state, train_set, 'audio', 8))
ap = C._ap50({'rgb': model}, model, train_set, cfg)
print('AUDIO-SUPERVISED AP@0.5 =', ap, flush=True)
