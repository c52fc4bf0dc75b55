"""Demo session (UI-less) and CLI tests."""

import zipfile

import numpy as np
from PIL import Image

from mia_tpu.entry.demo.serve import CLASS_COLOR_MAP, DemoSession, hex_to_rgb


def _make_images(tmp_path, n, size=(32, 32), rng=None):
    rng = rng or np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = tmp_path / f"img_{i:02d}.png"
        Image.fromarray(rng.integers(0, 256, size, dtype=np.uint8)).save(p)
        paths.append(str(p))
    return paths


def test_demo_session_full_loop(tmp_path, rng):
    paths = _make_images(tmp_path, 8)
    session = DemoSession(
        data_dir=tmp_path / "data", budget=2, batch_size=2, image_size=32
    )
    session.train_set = paths[:2]
    session.pool_set = paths[2:]

    selected = session.active_select()
    assert len(selected) == 2
    assert set(selected) <= set(paths[2:])

    # pseudo-label prediction through the jitted endpoint
    pseudo = session.predict_pseudo_label(Image.open(selected[0]))
    assert pseudo.shape == (32, 32)
    assert set(np.unique(pseudo)) <= {0, 1, 2}

    # editor value carries an RGBA layer per class
    value = session.editor_value(selected[0])
    assert value["background"].shape == (32, 32, 4)
    assert value["layers"][0].shape == (32, 32, 4)

    # accept an annotation: paint class 1 somewhere
    layer = np.zeros((32, 32, 4), np.uint8)
    layer[5:10, 5:10] = hex_to_rgb(CLASS_COLOR_MAP[1]) + [255]
    entry = session.accept(selected[0], value["background"], layer)
    assert (entry["mask"][5:10, 5:10] == 1).all()
    assert len(session.annotated_set) == 1
    assert selected[0] not in session.selected_set

    # zip download in the FUGC images/labels layout
    zip_path = session.create_download_dataset()
    with zipfile.ZipFile(zip_path) as z:
        names = z.namelist()
    assert any(n.startswith("images/") for n in names)
    assert any(n.startswith("labels/") for n in names)


def test_demo_batched_inference(tmp_path, rng):
    session = DemoSession(data_dir=tmp_path, image_size=32)
    images = rng.random((4, 32, 32, 1)).astype(np.float32)
    preds = session.predict_batch(images)
    assert preds.shape == (4, 32, 32)


def test_cli_visualize(tmp_path, rng):
    from mia_tpu.cli.__main__ import main

    img = tmp_path / "x.png"
    mask = tmp_path / "m.png"
    Image.fromarray(rng.integers(0, 256, (16, 16), dtype=np.uint8)).save(img)
    Image.fromarray(rng.integers(0, 3, (16, 16), dtype=np.uint8)).save(mask)
    out = tmp_path / "overlay.png"
    main(["visualize", "-f", str(img), "-m", str(mask), "-o", str(out)])
    assert out.is_file()
    assert np.array(Image.open(out)).shape == (16, 16, 3)


def test_serve_entry_builds_blocks_against_stub_gradio(tmp_path, monkeypatch):
    """Instantiate the full Gradio Blocks wiring (reference
    ``serve.py:377-382``) against a stub ``gradio`` module: every component
    must be constructed and every event handler registered, with no real UI."""
    import sys
    import types

    events = {"change": 0, "click": 0, "select": 0, "launched": []}

    class _Component:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def change(self, fn, inputs=None, outputs=None):
            events["change"] += 1

        def click(self, fn, inputs=None, outputs=None):
            events["click"] += 1

        def select(self, fn, inputs=None, outputs=None):
            events["select"] += 1

        def launch(self, **k):
            events["launched"].append(k)

    gr = types.ModuleType("gradio")
    for name in (
        "Blocks", "Accordion", "Row", "Gallery", "Number", "Text", "Button",
        "ImageEditor", "Brush", "DownloadButton",
    ):
        setattr(gr, name, type(name, (_Component,), {}))
    gr.SelectData = type("SelectData", (), {})
    monkeypatch.setitem(sys.modules, "gradio", gr)

    import mia_tpu.entry.demo.serve as serve_mod

    monkeypatch.setattr(
        serve_mod, "DemoSession",
        lambda *a, **k: DemoSession(data_dir=tmp_path, image_size=32),
    )
    serve_mod.serve_entry()

    assert events["launched"] == [{"inbrowser": True}]
    assert events["change"] == 7  # 2 galleries + 5 config inputs
    assert events["click"] == 2  # select + accept
    assert events["select"] == 1  # selected gallery -> editor


def test_demo_feature_provider_injection(tmp_path):
    """A fake provider drops in for BiomedCLIP (reference serve.py:48-104):
    active_select must consume ITS features."""
    import numpy as np

    from mia_tpu.entry.demo.serve import DemoSession

    imgs = _make_images(tmp_path, n=6)

    calls = []

    frng = np.random.default_rng(0)

    def fake_provider(dataset):
        feats = {}
        for i in range(len(dataset)):
            s = dataset.get_sample(i)
            feats[s["case_name"]] = frng.standard_normal(8).astype(np.float32)
        calls.append(len(feats))
        return feats

    session = DemoSession(
        data_dir=tmp_path, budget=2, image_size=32, feature_provider=fake_provider
    )
    session.train_set = imgs[:2]
    session.pool_set = imgs[2:]
    selected = session.active_select()
    assert len(selected) == 2
    assert calls, "injected provider was never called"
    assert all(str(s) in [str(p) for p in imgs[2:]] for s in selected)
