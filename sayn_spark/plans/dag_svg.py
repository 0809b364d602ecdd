"""Dependency-free DAG rendering: layered SVG.

Closes the reference's `dag-image` gap (`sayn/utils/graphviz.py:4-34`
renders via the graphviz binary, which this environment doesn't ship):
the execution levels from ``ready_sets`` give an x-coordinate per task,
tasks stack vertically within a level, and parent→child edges draw as
cubic curves.  Pure string assembly — no third-party dependency, output
opens in any browser.
"""

from __future__ import annotations

from sayn_spark.plans.dag import ready_sets

_BOX_W = 160
_BOX_H = 34
_GAP_X = 80
_GAP_Y = 22
_PAD = 24


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def dag_to_svg(dag: dict[str, list[str]]) -> str:
    """dag = {task: [parent names]} -> SVG document string."""
    levels = ready_sets(dag)
    pos: dict[str, tuple[int, int]] = {}
    for col, level in enumerate(levels):
        for row, name in enumerate(sorted(level)):
            x = _PAD + col * (_BOX_W + _GAP_X)
            y = _PAD + row * (_BOX_H + _GAP_Y)
            pos[name] = (x, y)
    width = _PAD * 2 + max((len(levels) - 1), 0) * (_BOX_W + _GAP_X) + _BOX_W
    height = (
        _PAD * 2
        + (max(len(l) for l in levels) - 1 if levels else 0) * (_BOX_H + _GAP_Y)
        + _BOX_H
    )
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}" font-family="monospace" font-size="12">',
        '<rect width="100%" height="100%" fill="white"/>',
    ]
    # edges first (under the boxes): parent right edge -> child left edge
    for name, parents in dag.items():
        x2, y2 = pos[name]
        for p in parents:
            if p not in pos:
                continue
            x1, y1 = pos[p]
            sx, sy = x1 + _BOX_W, y1 + _BOX_H // 2
            ex, ey = x2, y2 + _BOX_H // 2
            mx = (sx + ex) // 2
            parts.append(
                f'<path d="M {sx} {sy} C {mx} {sy}, {mx} {ey}, {ex} {ey}" '
                f'fill="none" stroke="#8a8a8a" stroke-width="1.5"/>'
            )
    for name, (x, y) in pos.items():
        parts.append(
            f'<rect x="{x}" y="{y}" width="{_BOX_W}" height="{_BOX_H}" rx="6" '
            f'fill="#eef3fb" stroke="#3b6db4" stroke-width="1.5"/>'
        )
        label = _esc(name if len(name) <= 20 else name[:19] + "…")
        parts.append(
            f'<text x="{x + _BOX_W // 2}" y="{y + _BOX_H // 2 + 4}" '
            f'text-anchor="middle">{label}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts) + "\n"
