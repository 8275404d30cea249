"""HTML comparison-webpage writer.

Parity target: third_party/xiuminglib vis/html.py as used by
compile_batch_vis (nfr_unit.py:637-690): a table page with per-batch rows
of images + caption cells, white/black themed, written next to the
validation epoch dirs for browser review.
"""

import os

__all__ = ["write_comparison_html", "compile_batch_vis"]

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ background: {bg}; color: {fg}; font-family: sans-serif; }}
table {{ border-collapse: collapse; }}
td {{ padding: 4px; text-align: center; vertical-align: top; }}
img {{ max-width: 256px; }}
</style></head><body>
<h2>{title}</h2>
<table>
{rows}
</table></body></html>
"""


def write_comparison_html(out_path, rows, captions, title="Validation",
                          white_bg=True):
    """rows: list of lists of cell strings — image paths (rendered as
    <img>) or plain text; captions: per-row list of labels."""
    html_rows = []
    for row, caps in zip(rows, captions):
        cells = []
        for cell, cap in zip(row, caps):
            if isinstance(cell, str) and cell.endswith(
                    (".png", ".jpg", ".apng", ".gif")):
                rel = os.path.relpath(
                    cell, os.path.dirname(os.path.abspath(out_path)))
                cells.append(
                    f"<td><img src='{rel}'><br>{cap}</td>")
            else:
                cells.append(f"<td>{cell}<br>{cap}</td>")
        html_rows.append("<tr>" + "".join(cells) + "</tr>")
    page = _PAGE.format(
        title=title, rows="\n".join(html_rows),
        bg="white" if white_bg else "black",
        fg="black" if white_bg else "white")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(page)
    return out_path


def compile_batch_vis(batch_dirs, out_html, white_bg=True,
                      keys=("pred_rgb.png", "pred_albedo.png",
                            "pred_normal.png", "gt_rgb.png")):
    """Compile per-batch vis dirs into one comparison page
    (nfr_unit.py:637-690)."""
    import json

    rows, captions = [], []
    for d in batch_dirs:
        meta_path = os.path.join(d, "metadata.json")
        meta = "{}"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.dumps(json.load(f))
        row = [meta]
        caps = ["metadata"]
        for k in keys:
            p = os.path.join(d, k)
            if os.path.exists(p):
                row.append(p)
                caps.append(k)
        rows.append(row)
        captions.append(caps)
    return write_comparison_html(out_html, rows, captions,
                                 white_bg=white_bg)
