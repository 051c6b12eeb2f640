"""Layout renderer tests (reference dev/graph/layout.rs + dev/graph.rs,
driven there by sha/src/main.rs:10-26 which renders simple_circuit.png)."""
import os

from sha2cq_tpu.dev.layout import capture_layout, dot_graph, render_svg, render_text
from sha2cq_tpu.models.simple import SimpleCircuit


def test_capture_layout_regions_and_cells():
    cs, cap = capture_layout(4, SimpleCircuit(7, 9))
    assert len(cap.regions) == 1
    region = cap.regions[0]
    assert region["name"] == "simple"
    rows = [r for _, _, r in region["cells"]]
    assert min(rows) == 0 and max(rows) == 1
    kinds = {kind for kind, _, _ in cap.cells}
    assert kinds == {"advice", "fixed"}
    # 3 advice cells + 1 fixed cell
    assert len(cap.cells) == 4


def test_render_svg_writes_wellformed_file(tmp_path):
    path = os.path.join(tmp_path, "simple.svg")
    svg = render_svg(4, SimpleCircuit(7, 9), path=path)
    assert os.path.exists(path)
    assert svg.startswith("<svg") and svg.rstrip().endswith("</svg>")
    # region label and column headers present
    assert "simple" in svg
    assert ">a0<" in svg and ">a1<" in svg and ">f0<" in svg and ">i0<" in svg
    # parses as XML
    import xml.etree.ElementTree as ET
    ET.fromstring(svg)


def test_render_text_grid():
    text = render_text(4, SimpleCircuit(7, 9))
    lines = text.splitlines()
    assert lines[0] == "aafi"         # 2 advice, 1 fixed, 1 instance
    assert lines[1].startswith("aaf")  # row 0: a, b, q assigned
    assert lines[2][1] == "a"          # row 1: only b assigned


def test_dot_graph():
    dot = dot_graph(4, SimpleCircuit(7, 9))
    assert dot.startswith("digraph circuit {") and dot.endswith("}")
    assert "simple" in dot and "rows 0..1" in dot
    assert "root -> r0;" in dot


def test_render_png_writes_image(tmp_path):
    """PNG output (reference plotters BitMapBackend / simple_circuit.png,
    dev/graph/layout.rs) — skipped when matplotlib is absent."""
    import pytest
    pytest.importorskip("matplotlib")
    from sha2cq_tpu.dev.layout import render_png
    path = str(tmp_path / "layout.png")
    out = render_png(4, SimpleCircuit(7, 9), path)
    assert out == path
    with open(path, "rb") as f:
        magic = f.read(8)
    assert magic == b"\x89PNG\r\n\x1a\n"
