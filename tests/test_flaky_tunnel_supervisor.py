"""Pure-logic legs of the tunnel-outage supervisor (scripts/
flaky_tunnel_supervisor.py): checkpoint discovery must require a COMPLETE
gen+opt pair (a kill can tear an orbax save), and resume-flag expansion
must vanish once the run reached its target iter."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from flaky_tunnel_supervisor import latest_ckpt_iter


def test_latest_ckpt_requires_complete_pair(tmp_path):
    ck = tmp_path / "ckpt"
    ck.mkdir()
    for it in (2000, 4000):
        (ck / f"I{it}_E0_gen").mkdir()
        (ck / f"I{it}_E0_opt").mkdir()
    (ck / "I6000_E0_gen").mkdir()  # torn save: no _opt
    assert latest_ckpt_iter(str(ck / "I*_E0_gen")) == 4000


def test_latest_ckpt_empty(tmp_path):
    assert latest_ckpt_iter(str(tmp_path / "I*_E0_gen")) == 0
