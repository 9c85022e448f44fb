"""Dataset, dataloader, and preprocessing tests on a synthetic Goodreads dir."""
import os

import numpy as np
import pytest

from sdbc_tpu.data.dataset import DatasetConfig, GoodreadsDataset, make_dataloader
from sdbc_tpu.data.preprocess import english_keep_ratio, preprocess
from sdbc_tpu.data.tokenizer import CLIPTokenizer
from tests.data_fixtures import build_fake_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return build_fake_dataset(str(tmp_path_factory.mktemp("ds")),
                              with_source=True)


@pytest.fixture(scope="module")
def dataset(data_root):
    cfg = DatasetConfig(data_root=data_root, img_size=32, max_length=16,
                        legible_text_prob=0.5)
    return GoodreadsDataset(cfg, CLIPTokenizer.fallback(1000))


def test_item_shapes_and_range(dataset):
    item = dataset[0]
    assert item["pixel_values"].shape == (32, 32, 3)
    assert item["pixel_values"].min() >= -1.0
    assert item["pixel_values"].max() <= 1.0
    assert item["input_ids"].shape == (16,)
    assert "Author 0" in item["prompt"] and "Title 0" in item["prompt"]


def test_size_cap(data_root):
    cfg = DatasetConfig(data_root=data_root, img_size=32, size=3)
    ds = GoodreadsDataset(cfg, CLIPTokenizer.fallback(1000))
    assert len(ds) == 3


def test_dataloader_batch_shapes(dataset):
    loader = make_dataloader(dataset, micro_batch=2, grad_accum=2,
                             num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # 8 examples / (2*2)
    b = batches[0]
    assert b["pixel_values"].shape == (2, 2, 32, 32, 3)
    assert b["input_ids"].shape == (2, 2, 16)


def test_dual_tokenizer_batches(data_root):
    """tokenizer2 (SDXL) ⇒ items/batches carry input_ids_2 encoding the
    SAME drawn prompt as input_ids (one prompt draw per index)."""
    cfg = DatasetConfig(data_root=data_root, img_size=32, max_length=16,
                        legible_text_prob=0.5)
    tok = CLIPTokenizer.fallback(1000)
    ds = GoodreadsDataset(cfg, tok, tokenizer2=tok)
    item = ds[0]
    assert item["input_ids_2"].shape == (16,)
    np.testing.assert_array_equal(item["input_ids"], item["input_ids_2"])
    b = next(iter(make_dataloader(ds, micro_batch=2, grad_accum=2, seed=5)))
    assert b["input_ids_2"].shape == (2, 2, 16)
    # identical tokenizers ⇒ identical ids: proves both encodings come
    # from one prompt draw (a second draw would advance the visit rng)
    np.testing.assert_array_equal(np.asarray(b["input_ids"]),
                                  np.asarray(b["input_ids_2"]))


def test_dataloader_epoch_shuffling(dataset):
    b1 = next(iter(make_dataloader(dataset, 2, 1, seed=1)))
    b2 = next(iter(make_dataloader(dataset, 2, 1, seed=2)))
    assert not np.array_equal(b1["pixel_values"], b2["pixel_values"])


def _fresh_batches(data_root, workers, use_native, seed=3):
    cfg = DatasetConfig(data_root=data_root, img_size=32, max_length=16,
                        legible_text_prob=0.5, use_native=use_native)
    ds = GoodreadsDataset(cfg, CLIPTokenizer.fallback(1000))
    return list(make_dataloader(ds, micro_batch=2, grad_accum=2,
                                num_workers=workers, seed=seed))


def test_prompt_pairing_thread_order_independent(data_root):
    """Prompt↔image pairing must not depend on thread scheduling: 4-worker
    and 1-worker loaders (and the native batch path) yield identical ids."""
    a = _fresh_batches(data_root, workers=4, use_native=False)
    b = _fresh_batches(data_root, workers=1, use_native=False)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["input_ids"], y["input_ids"])
        np.testing.assert_array_equal(x["pixel_values"], y["pixel_values"])
    from sdbc_tpu.data import native_loader as nl

    if nl.available():
        c = _fresh_batches(data_root, workers=4, use_native=True)
        for x, y in zip(a, c):
            np.testing.assert_array_equal(x["input_ids"], y["input_ids"])


def test_prompt_draws_reproduce_and_vary_by_epoch(data_root):
    cfg = DatasetConfig(data_root=data_root, img_size=32, max_length=16,
                        legible_text_prob=0.5)
    ds = GoodreadsDataset(cfg, CLIPTokenizer.fallback(1000))
    epoch1 = [ds.prompt_for(i) for i in range(len(ds))]
    epoch2 = [ds.prompt_for(i) for i in range(len(ds))]
    assert epoch1 != epoch2  # visit count advances the draw stream
    ds2 = GoodreadsDataset(cfg, CLIPTokenizer.fallback(1000))
    assert [ds2.prompt_for(i) for i in range(len(ds2))] == epoch1


def test_epoch_keyed_prompts_host_independent(data_root):
    """With set_epoch (the trainer path), prompt draws depend only on
    (seed, idx, epoch) — a 'host' that first sees an index at epoch 1 draws
    the same prompt as a host that visited it every epoch (multi-host index
    migration must not replay epoch-0 prompts)."""
    cfg = DatasetConfig(data_root=data_root, img_size=32, max_length=16,
                        legible_text_prob=0.5)
    host_a = GoodreadsDataset(cfg, CLIPTokenizer.fallback(1000))
    host_a.set_epoch(0)
    e0 = [host_a.prompt_for(i) for i in range(len(host_a))]
    host_a.set_epoch(1)
    e1 = [host_a.prompt_for(i) for i in range(len(host_a))]
    assert e0 != e1  # the epoch advances the draw stream

    # host B never saw epoch 0; its epoch-1 draws must match host A's
    host_b = GoodreadsDataset(cfg, CLIPTokenizer.fallback(1000))
    host_b.set_epoch(1)
    assert [host_b.prompt_for(i) for i in range(len(host_b))] == e1

    # and the loader plumbs the epoch through
    next(make_dataloader(host_b, micro_batch=2, grad_accum=1, epoch=3))
    assert host_b._epoch == 3


def test_english_keep_ratio():
    assert english_keep_ratio("A normal English sentence.") == 1.0
    assert english_keep_ratio("Полностью русский текст") < 0.5
    assert english_keep_ratio("") == 0.0


def test_preprocess_pipeline(data_root):
    train_csv, test_csv = preprocess(data_root, "book_data.csv", n_test=4,
                                     verbose=False)
    import pandas as pd

    train = pd.read_csv(train_csv, index_col=0)
    test = pd.read_csv(test_csv, index_col=0)
    # russian row dropped by english filter; 13 rows → 12 kept → 8/4 split
    assert len(test) == 4
    assert len(train) == 8
    assert set(train.columns) == {"book_authors", "book_desc", "book_title"}
    dropped = pd.read_csv(os.path.join(data_root, "dropped_non_English.csv"),
                          index_col=0)
    assert len(dropped) == 1


def test_native_loader_matches_pil(data_root):
    """C++ decode core vs PIL reference path (quantization-level tolerance)."""
    from sdbc_tpu.data import native_loader as nl
    from sdbc_tpu.utils.image import decode_and_prepare

    path = os.path.join(data_root, "images", "images", "0.jpg")
    if not nl.available():
        pytest.skip("native loader not built")
    out = nl.decode_batch([path, path], 32)
    assert out.shape == (2, 32, 32, 3)
    ref = decode_and_prepare(path, 32)
    assert np.abs(out[0] - ref).max() < 0.06  # separate fixed-point paths
    np.testing.assert_array_equal(out[0], out[1])
    assert nl.probe(path)
    assert not nl.probe(os.path.join(data_root, "df_train.csv"))


def test_native_lib_search_order(monkeypatch, tmp_path):
    """SDBC_NATIVE_LIB overrides; installed package copy beats repo native/."""
    from sdbc_tpu.data import native_loader as nl

    # env override: honored when it exists, None (no fallback) when it doesn't
    fake = tmp_path / "lib.so"
    fake.write_bytes(b"")
    monkeypatch.setenv("SDBC_NATIVE_LIB", str(fake))
    assert nl._find_lib() == str(fake)
    monkeypatch.setenv("SDBC_NATIVE_LIB", str(tmp_path / "missing.so"))
    with pytest.warns(UserWarning, match="does not exist"):
        assert nl._find_lib() is None
    monkeypatch.delenv("SDBC_NATIVE_LIB")

    # installed-package copy (sdbc_tpu/_native/, from setup.py) wins over
    # the repo-layout auto-build path
    pkg = tmp_path / "pkgroot" / "sdbc_tpu"
    (pkg / "_native").mkdir(parents=True)
    installed = pkg / "_native" / "libsdbc_loader.so"
    installed.write_bytes(b"")
    monkeypatch.setattr(nl, "_PKG_DIR", str(pkg))
    assert nl._find_lib() == str(installed)


def test_dataloader_native_flag(data_root):
    from sdbc_tpu.data.dataset import DatasetConfig, GoodreadsDataset, make_dataloader
    from sdbc_tpu.data.tokenizer import CLIPTokenizer

    cfg = DatasetConfig(data_root=data_root, img_size=32, max_length=16,
                        use_native=True)
    ds = GoodreadsDataset(cfg, CLIPTokenizer.fallback(1000))
    b = next(iter(make_dataloader(ds, micro_batch=2, grad_accum=1)))
    assert b["pixel_values"].shape == (1, 2, 32, 32, 3)
    assert np.isfinite(b["pixel_values"]).all()
