"""File lifecycle sink (S9): commit processed inputs by move/delete.

The reference's "commit protocol" is filesystem state: on success a
file is deleted or moved to ``finished/``; on failure it is moved to
``failed/`` unless it already lives there (csv_extractor.py:184-192,
:214-219, :82-89; directory setup main.py:92-97).

This is driver-side metadata work (like the reference), deliberately
NOT distributed: the files just processed number ≤20 per live cycle.
In a pure Structured Streaming deployment the same behavior comes from
the file source's ``cleanSource=archive|delete`` option; we keep the
explicit helper because it also serves the historical batch path and
gives the failure-routing the built-in option lacks.
"""

from __future__ import annotations

import shutil
from pathlib import Path


def setup_directories(input_dir: str | Path) -> tuple[Path, Path]:
    """Create ``finished/`` and ``failed/`` beside the inputs (main.py:92-97)."""
    base = Path(input_dir)
    finished = base / "finished"
    failed = base / "failed"
    finished.mkdir(parents=True, exist_ok=True)
    failed.mkdir(parents=True, exist_ok=True)
    return finished, failed


def finalize_succeeded(
    paths: list[Path], finished_dir: Path | None, delete: bool = False
) -> None:
    """Delete each file, or move it to ``finished/`` (csv_extractor.py:184-192).

    A file that vanished (another worker finalized it) is skipped, the
    reference's tolerance at csv_extractor.py:188-192.
    """
    for path in paths:
        try:
            if delete or finished_dir is None:
                Path(path).unlink()
            else:
                shutil.move(str(path), str(finished_dir / Path(path).name))
        except (FileNotFoundError, shutil.Error):
            continue


def quarantine_failed(paths: list[Path], failed_dir: Path) -> None:
    """Move failed inputs to ``failed/`` unless already there (:214-219)."""
    for path in paths:
        p = Path(path)
        if p.parent == Path(failed_dir):
            continue
        try:
            shutil.move(str(p), str(Path(failed_dir) / p.name))
        except (FileNotFoundError, shutil.Error):
            continue
