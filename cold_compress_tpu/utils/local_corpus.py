"""Deterministic local text corpus with a train/held-out split.

The offline environment cannot download benchmark corpora or trained
checkpoints, so the trained-fixture pipeline (scripts/train_tiny.py) and the
Local* evaluation tasks (evals/task.py) share this corpus: locally available
program text and license prose, split by a stable filename hash. Bucket 0 of
16 is HELD OUT — never used for training — so task metrics measured on it are
honest generalization numbers, not memorization.
"""

import hashlib
from pathlib import Path
from typing import List, Tuple

_ROOTS = [
    (Path("/usr/lib/python3.11"), "*.py"),
    (Path("/usr/share/common-licenses"), "*"),
    (Path("/opt/venv/lib/python3.12/site-packages/numpy"), "*.py"),
    (Path("/opt/venv/lib/python3.12/site-packages/jax"), "*.py"),
]


def corpus_files() -> List[Path]:
    """Sorted list of candidate text files (stable ordering)."""
    files: List[Path] = []
    for root, pat in _ROOTS:
        if root.exists():
            files += [f for f in sorted(root.rglob(pat)) if f.is_file()]
    return files


def held_out(f: Path) -> bool:
    """True for eval-only files (hash bucket 0 of 16 on the file NAME)."""
    return hashlib.sha1(f.name.encode()).digest()[0] % 16 == 0


def load_split(max_mb: float = 24.0) -> Tuple[List[bytes], List[bytes]]:
    """(train_texts, held_out_texts) as raw bytes per file."""
    train, val = [], []
    budget = int(max_mb * 1e6)
    for f in corpus_files():
        try:
            data = f.read_bytes()
        except OSError:
            continue
        if not (256 < len(data) < 2_000_000):
            continue
        (val if held_out(f) else train).append(data)
        budget -= len(data)
        if budget < 0:
            break
    return train, val


def held_out_texts(max_files: int = 200) -> List[str]:
    """Held-out files decoded to str, longest first (eval material)."""
    _, val = load_split()
    texts = [b.decode("utf-8", errors="replace") for b in val]
    texts.sort(key=len, reverse=True)
    return texts[:max_files]
