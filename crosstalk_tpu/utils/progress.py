"""Progress bars matching the reference's tqdm UX.

The reference wraps its train, val, and eval loops in tqdm
(train_model.py:416,439; test-cross-talk-model.py:44). Bars here
auto-disable when stderr is not a TTY (tqdm's ``disable=None``), so CI and
redirected logs stay clean while interactive runs look like the reference.

Note: with the async-dispatch training loop the bar tracks host-side batch
feeding (H2D prefetch), not device step completion — once the prefetch
queue fills the two advance together.
"""

from __future__ import annotations


def progress(iterable, desc: str | None, total: int | None = None):
    """Wrap an iterable in a tqdm bar; pass through if tqdm is unavailable
    or ``desc`` is None (non-primary processes in multi-host runs)."""
    if desc is None:
        return iterable
    try:
        from tqdm import tqdm
    except ImportError:  # tqdm is optional — plain iteration is fine
        return iterable
    return tqdm(iterable, desc=desc, total=total, disable=None)
