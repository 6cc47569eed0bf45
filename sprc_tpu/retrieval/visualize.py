"""Qualitative result visualizers.

Compact equivalents of the reference's ad-hoc failure-case dumps
(reference: src/validate_blip.py:59-147, validate_blip_rerank.py:250-276):
write side-by-side panels [reference | top-k retrieved | target] for queries
matching a predicate (e.g. failures where the target is outside the top-k),
with the caption drawn into the image.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np


def _load(path: str, size: int = 224):
    import PIL.Image

    return PIL.Image.open(path).convert("RGB").resize((size, size))


def save_failure_panels(
    output_dir: str,
    sorted_names: np.ndarray,
    reference_names: Sequence[str],
    target_names: Sequence[str],
    captions: Sequence[str],
    name_to_path: Callable[[str], str],
    *,
    top_k: int = 5,
    panel_size: int = 224,
    predicate: Optional[Callable[[int, np.ndarray], bool]] = None,
    max_panels: int = 50,
) -> int:
    """Write panels for queries selected by ``predicate(i, row_labels)``.

    Default predicate: failure cases where the target is not in the top-10
    (the reference's vis_fiq_failure2 criterion, validate_blip.py:96).
    Returns the number of panels written.
    """
    import PIL.Image
    import PIL.ImageDraw

    os.makedirs(output_dir, exist_ok=True)
    targets = np.asarray(target_names)[:, None]
    labels = np.asarray(sorted_names) == targets

    if predicate is None:
        predicate = lambda i, row: row[:10].sum() < 1  # noqa: E731

    written = 0
    for i in range(len(captions)):
        if written >= max_panels or not predicate(i, labels[i]):
            continue
        tiles = [_load(name_to_path(reference_names[i]), panel_size)]
        tiles += [
            _load(name_to_path(n), panel_size) for n in sorted_names[i][:top_k]
        ]
        tiles.append(_load(name_to_path(target_names[i]), panel_size))
        panel = PIL.Image.new(
            "RGB", (panel_size * len(tiles), panel_size + 28), (255, 255, 255)
        )
        for j, tile in enumerate(tiles):
            panel.paste(tile, (j * panel_size, 0))
        draw = PIL.ImageDraw.Draw(panel)
        rank = int(np.argmax(labels[i])) + 1 if labels[i].any() else -1
        draw.text(
            (4, panel_size + 6), f"rank={rank}  {captions[i][:180]}", fill=(0, 0, 0)
        )
        panel.save(os.path.join(output_dir, f"{written:04d}_q{i}.png"))
        written += 1
    return written
