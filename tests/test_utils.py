"""Tests for general utilities (progress reporting)."""

import io
from contextlib import redirect_stderr

from allophant_tpu.utils import OnlineMean, progress_bar


class TestProgressBar:
    def test_disabled_returns_iterable_unchanged(self):
        items = [1, 2, 3]
        assert list(progress_bar(items, enabled=False)) == items

    def test_disabled_manual_bar_is_inert(self):
        bar = progress_bar(enabled=False)
        bar.update(5)
        bar.set_postfix(loss="0.1", refresh=False)
        bar.set_description("phase")
        bar.close()
        with progress_bar(enabled=False) as inner:
            assert list(inner) == []

    def test_enabled_iterates_and_counts(self):
        with redirect_stderr(io.StringIO()):
            assert list(progress_bar(range(4), enabled=True, desc="t", unit="x")) == [0, 1, 2, 3]

    def test_enabled_manual_updates(self):
        with redirect_stderr(io.StringIO()):
            bar = progress_bar(enabled=True, desc="manual", unit="utt")
            bar.update(3)
            bar.set_postfix(loss="1.0", refresh=False)
            bar.close()


class TestOnlineMean:
    def test_weighted_mean(self):
        mean = OnlineMean()
        mean.add(1.0).add(3.0)
        assert mean.mean == 2.0
        mean.add(10.0, count=2)
        assert abs(mean.mean - 6.0) < 1e-12
        assert mean.count == 4
