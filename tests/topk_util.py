"""Top-k comparison tolerant of float-ulp tie reordering.

Device (XLA) and host (numpy) float32 math can differ by ~1 ulp (e.g.
rsqrt vs /sqrt), which may swap adjacent results whose scores are equal up
to tolerance. The exactness gate mirrors the reference's recall@10 = 1.0:
identical docs wherever scores are distinct; swaps allowed only inside
near-ties.
"""

import pytest


def assert_topk_equiv(got, want, rel=1e-5, abs_=1e-6):
    """got/want: ordered [(doc, score)]. Same length, same score ladder,
    and any doc mismatch at a rank must be a near-tie swap."""
    assert len(got) == len(want), (got, want)
    want_scores = {d: s for d, s in want}
    got_scores = {d: s for d, s in got}
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=rel, abs=abs_), (gd, gs, wd, ws)
        if gd != wd:
            # swap within a tie: both docs present in both lists with ~equal scores
            assert gd in want_scores and wd in got_scores, (gd, wd)
            assert want_scores[gd] == pytest.approx(ws, rel=rel, abs=abs_)
