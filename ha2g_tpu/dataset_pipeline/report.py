"""Dataset-construction QA report (the reference's review GUI, rebuilt
headless).

The reference ships an interactive OpenCV tool to eyeball filter
decisions scene by scene (dataset_script/script/review_filtered_clips.py:
34-383: draws the tracked skeleton over video frames, steps through
clips, lets a human veto).  This module produces the same review surface
as a single static HTML report instead: per-scene verdicts with reason
counts, and skeleton-overlay contact sheets for a sample of passed and
rejected scenes — reviewable anywhere, no GUI or video files needed.

``run_filter_pass`` is the convenience driver: main-speaker tracking +
ClipFilter over raw scenes (the logic stages of
dataset_script/script/run_filtering.py) with every decision recorded for
the report.
"""

from __future__ import annotations

import base64
import html
import io
from collections import Counter
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ha2g_tpu.dataset_pipeline.filtering import (ClipFilter,
                                                 select_main_speaker)

# OpenPose BODY_25 upper-body bones drawn by the reference review tool
_BONES = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7)]


def run_filter_pass(scenes: Sequence[Sequence[np.ndarray]],
                    fps: float = 25.0,
                    min_shoulder_px: float = 100.0) -> list[dict]:
    """Track + filter each scene; returns one decision record per scene:
    {index, verdict ('PASS' or the reject reason), n_frames, speakers}."""
    decisions = []
    for i, scene in enumerate(scenes):
        speakers = select_main_speaker(scene)
        f = ClipFilter(scene, speakers, fps=fps,
                       min_shoulder_px=min_shoulder_px)
        ok = f.is_correct_clip()
        decisions.append({
            "index": i, "verdict": f.message if not ok else "PASS",
            "passed": ok, "n_frames": len(scene), "speakers": speakers,
        })
    return decisions


def _overlay_png(scene, speakers, title: str, n_cols: int = 4) -> bytes:
    """Contact sheet: tracked-skeleton overlay for evenly spaced frames
    (the reference tool's per-frame skeleton drawing, done in batch)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    idx = np.linspace(0, len(scene) - 1, min(n_cols, len(scene)),
                      dtype=int)
    fig, axes = plt.subplots(1, len(idx), figsize=(3 * len(idx), 3))
    axes = np.atleast_1d(axes)
    for ax, i in zip(axes, idx):
        frame, person = scene[i], speakers[i]
        for other in frame:  # everyone else, faint
            pts = other[:, :2]
            ax.scatter(pts[:, 0], -pts[:, 1], s=4, c="#bbbbbb")
        if person is not None:
            pts = person[:, :2]
            for a, b in _BONES:
                if pts[a].all() and pts[b].all():
                    ax.plot([pts[a, 0], pts[b, 0]],
                            [-pts[a, 1], -pts[b, 1]], c="tab:blue", lw=2)
            ax.scatter(pts[:, 0], -pts[:, 1], s=10, c="tab:red", zorder=3)
        else:
            ax.text(0.5, 0.5, "no speaker", transform=ax.transAxes,
                    ha="center")
        ax.set_title(f"frame {i}", fontsize=8)
        ax.set_aspect("equal")
        ax.axis("off")
    fig.suptitle(title, fontsize=10)
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=72, bbox_inches="tight")
    plt.close(fig)
    return buf.getvalue()


def write_qa_report(scenes: Sequence[Sequence[np.ndarray]],
                    decisions: Sequence[dict], out_path: str | Path,
                    max_overlays: int = 6) -> Path:
    """Render decisions (from run_filter_pass) as a standalone HTML file
    with reason statistics and overlay contact sheets (PNGs inlined as
    data URIs so the report is a single file)."""
    out_path = Path(out_path)
    counts = Counter(d["verdict"] for d in decisions)
    n = max(len(decisions), 1)

    rows = "\n".join(
        f"<tr class={'pass' if d['passed'] else 'fail'}>"
        f"<td>{d['index']}</td><td>{d['n_frames']}</td>"
        f"<td>{html.escape(d['verdict'])}</td></tr>"
        for d in decisions)
    stats = "\n".join(
        f"<tr><td>{html.escape(k)}</td><td>{v}</td>"
        f"<td>{100 * v / n:.1f}%</td></tr>"
        for k, v in counts.most_common())

    # overlay a sample: up to half passes, half rejects
    imgs = []
    passed = [d for d in decisions if d["passed"]]
    failed = [d for d in decisions if not d["passed"]]
    for d in (passed[:max_overlays // 2] +
              failed[:max_overlays - len(passed[:max_overlays // 2])]):
        png = _overlay_png(scenes[d["index"]], d["speakers"],
                           f"scene {d['index']}: {d['verdict']}")
        imgs.append(f'<img src="data:image/png;base64,'
                    f'{base64.b64encode(png).decode()}"/>')

    out_path.write_text(f"""<!doctype html><meta charset="utf-8">
<title>dataset QA report</title>
<style>
 body {{ font-family: sans-serif; margin: 2em; }}
 table {{ border-collapse: collapse; margin: 1em 0; }}
 td, th {{ border: 1px solid #ccc; padding: 2px 10px; }}
 tr.pass td {{ background: #eaffea; }}
 tr.fail td {{ background: #ffecec; }}
 img {{ display: block; margin: 8px 0; max-width: 100%; }}
</style>
<h1>Dataset QA report</h1>
<p>{len(decisions)} scenes; {sum(d['passed'] for d in decisions)} passed
({100 * sum(d['passed'] for d in decisions) / n:.1f}%).</p>
<h2>Filter reasons</h2>
<table><tr><th>verdict</th><th>scenes</th><th>share</th></tr>{stats}</table>
<h2>Skeleton overlays</h2>
{''.join(imgs)}
<h2>Per-scene decisions</h2>
<table><tr><th>scene</th><th>frames</th><th>verdict</th></tr>{rows}</table>
""")
    return out_path
