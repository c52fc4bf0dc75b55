"""Execute the driver entry points end-to-end in-process.

``dryrun_multichip(8)`` is the driver's multi-chip validation
(MULTICHIP_r{N}.json). Round 4 shipped a donation bug that killed it at
stage 3b (VERDICT r4 weak #2) and nothing in the suite caught it because
the dryrun itself was never executed under test — this file closes that
hole. The conftest already forces the 8-virtual-device CPU platform the
dryrun expects.
"""

import jax
import pytest


def test_entry_forward_jits():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].shape[0]


@pytest.mark.slow
def test_dryrun_multichip_8(capsys):
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
    out = capsys.readouterr().out
    # every stage the driver's tail must show (VERDICT r4 item 2)
    for marker in (
        "loss=",
        "pool sweep entropy",
        "cpcsam phase2",
        "cpcsam sharded valid",
        "fsdp step",
        "tp encoder fwd+bwd",
    ):
        assert marker in out, f"dryrun stage missing: {marker}\n{out}"
