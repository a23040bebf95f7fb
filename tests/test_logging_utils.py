"""Per-rank run logging: one file handler at a time.

Harnesses that drive several runs in one process (convergence_shipped
trains 3 teachers sequentially; reference semantics are one run per
process, train.py:283-292) must not spray later runs' records into
earlier runs' log files.
"""
import os

from mm_distillnet_tpu.utils.logging_utils import setup_run_logging


def test_handler_switches_between_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    lg = setup_run_logging({'exp_name': 'runA'}, 0)
    lg.info('in-A')
    lg = setup_run_logging({'exp_name': 'runB'}, 0)
    lg.info('in-B')
    # re-setup with the same path must not duplicate the handler
    lg = setup_run_logging({'exp_name': 'runB'}, 0)
    lg.info('in-B2')
    a = (tmp_path / 'runA' / 'runA.0.log').read_text()
    b = (tmp_path / 'runB' / 'runB.0.log').read_text()
    assert 'in-A' in a and 'in-B' not in a
    assert 'in-B' in b and 'in-A' not in b
    assert b.count('in-B2') == 1
