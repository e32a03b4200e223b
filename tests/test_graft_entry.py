"""Driver-contract tests: dryrun_multichip on the CPU mesh.

These are GATE tests: the driver runs ``dryrun_multichip`` with a hard
wall-clock budget, so beyond correctness they assert the budget — a commit
that fattens the gate (r3 regression: a full-scale GSPMD compile check was
added inside it and timed the driver out) fails here instead of in the next
round's MULTICHIP report.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Driver budget is ~10 min; hold ourselves to half that WARM (the driver
# benefits from the persistent compile cache after the first round on a
# machine). Cold on this class of host measures ~3 min.
_GATE_BUDGET_S = 330


def _run_dryrun(n: int) -> float:
    """Run dryrun_multichip(n) exactly as the driver does (fresh process,
    no _AP_DRYRUN_CHILD, no pytest conftest platform overrides); return
    wall seconds."""

    env = {k: v for k, v in os.environ.items() if k != "_AP_DRYRUN_CHILD"}
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-c",
         f"import __graft_entry__ as g; g.dryrun_multichip({n})"],
        cwd=_REPO, env=env, capture_output=True, text=True,
        timeout=_GATE_BUDGET_S + 60,
    )
    wall = time.monotonic() - t0
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert f"dryrun_multichip({n}): ok" in proc.stdout
    assert "sharded generate ok" in proc.stdout
    return wall


def test_dryrun_multichip_8_within_budget():
    wall = _run_dryrun(8)
    assert wall < _GATE_BUDGET_S, (
        f"dryrun_multichip(8) took {wall:.0f}s — over the {_GATE_BUDGET_S}s "
        "self-imposed gate budget; whatever was just added to the gate must "
        "move behind AP_DRYRUN_FULL or into a standalone script")


def test_dryrun_multichip_4():
    import __graft_entry__ as g

    g.dryrun_multichip(4)
