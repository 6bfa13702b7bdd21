"""Driver-contract tests for __graft_entry__ (multichip dryrun; entry shapes)."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft_entry


class TestGraftEntry:
    def test_dryrun_multichip_8(self, capsys):
        graft_entry.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "dryrun_multichip ok" in out
        assert "loss=" in out

    def test_entry_is_traceable(self, monkeypatch):
        """entry() must return a jit-traceable fn; trace the tiny preset (the
        3B flagship is exercised on real hardware, not in CPU tests)."""
        monkeypatch.setenv("KARANTA_ENTRY_PRESET", "tiny")
        fn, args = graft_entry.entry()
        shape = jax.eval_shape(fn, *args)
        assert shape.shape[0] == 1  # (batch, seq, vocab) logits
        assert shape.shape[1] == 512
