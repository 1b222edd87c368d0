"""Layout renderer (SURVEY.md §2.3 N15 — the test-dev-graph equivalent)."""

import os


def test_render_layout(tmp_path):
    from zkodst_tpu.circuit.blake2f import Blake2fCircuit
    from zkodst_tpu.utils.layout_viz import render_layout

    built = Blake2fCircuit(k=17, n_inst=1)          # layout only: no jit
    out = render_layout(built, str(tmp_path / "layout.png"), max_rows=300)
    assert os.path.getsize(out) > 10_000             # a real image, not a stub
