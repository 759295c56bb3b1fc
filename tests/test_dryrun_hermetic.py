"""Hermeticity of the driver-facing multichip dryrun.

The one capability a single chip cannot prove is multi-chip sharding, and
the driver validates it via ``__graft_entry__.dryrun_multichip`` on virtual
CPU devices. Rounds 1 and 2 produced red MULTICHIP artifacts because the
axon TPU plugin (registered from sitecustomize, gated on
``PALLAS_AXON_POOL_IPS``) ignores ``JAX_PLATFORMS=cpu`` and hijacked the
"CPU-only" check — so a broken TPU environment broke the dryrun. The fix
unsets the plugin's gate variables in the subprocess env, making the child
a pure-CPU JAX process by construction.

This test proves it: the dryrun must pass even when the TPU tunnel env is
deliberately poisoned (pointed at an unroutable address). The poison vars
are set in *this* process's environ — sitecustomize already ran here, so
they only affect what the dryrun's child process would inherit; a
non-hermetic child would try to register a plugin dialing a black hole.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__  # noqa: E402


def test_dryrun_passes_with_poisoned_tpu_env(monkeypatch, capfd):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.255.255.1")
    monkeypatch.setenv("PALLAS_AXON_TPU_GEN", "v5e")
    monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    __graft_entry__.dryrun_multichip(8)  # raises on child failure
    out = capfd.readouterr().out
    assert "dryrun_multichip OK" in out, out
    # The child must never have registered/dialed the axon backend: its
    # captured output carries no plugin boot banner or register() error.
    assert "_pjrt_boot" not in out, out
    assert "register() failed" not in out, out
