"""Driver entry-point smoke tests (bitrot guard for __graft_entry__).

The driver compile-checks `entry()` single-chip and runs
`dryrun_multichip(N)` on a virtual CPU mesh; exercise the latter here on
the conftest 8-device mesh so interface drift fails in CI, not in the
driver.
"""

import sys

sys.path.insert(0, ".")


def test_dryrun_multichip_8():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
