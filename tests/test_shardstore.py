"""Native FMRS shard store: build, roundtrip, batch sampling, fallback."""

import os
import numpy as np
import pytest

from femasr_tpu.native import (ShardStoreReader, ShardStoreWriter,
                               make_shard_from_folder, native_available)


@pytest.fixture
def shard(tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / 'test.fmrs')
    imgs = [(f'img{i}', (rng.random((40 + i, 50, 3)) * 255).astype(np.uint8))
            for i in range(5)]
    with ShardStoreWriter(path) as w:
        for key, img in imgs:
            w.add(key, img)
    return path, imgs


def test_native_builds():
    assert native_available(), 'g++ shardstore build failed'


def test_roundtrip(shard):
    path, imgs = shard
    r = ShardStoreReader(path)
    assert len(r) == 5
    assert r.keys() == [k for k, _ in imgs]
    for i, (key, img) in enumerate(imgs):
        assert r.meta(i)[:3] == img.shape
        np.testing.assert_array_equal(r.read(i), img)
    r.close()


def test_sample_batch_deterministic(shard):
    path, imgs = shard
    r = ShardStoreReader(path, num_threads=2)
    batch = r.sample_batch([0, 1, 2, 0], crop=32, seed=7)
    assert batch.shape == (4, 32, 32, 3)
    batch2 = r.sample_batch([0, 1, 2, 0], crop=32, seed=7)
    np.testing.assert_array_equal(batch, batch2)
    batch3 = r.sample_batch([0, 1, 2, 0], crop=32, seed=8)
    assert not np.array_equal(batch, batch3)
    r.close()


def test_sample_batch_crops_are_real_subimages(shard):
    path, imgs = shard
    r = ShardStoreReader(path)
    batch = r.sample_batch([0], crop=16, hflip=False, vflip=False,
                           rot90=False, seed=3)
    img = imgs[0][1]
    # the crop must appear somewhere in the source image
    found = False
    for top in range(img.shape[0] - 15):
        for left in range(img.shape[1] - 15):
            if np.array_equal(img[top:top + 16, left:left + 16], batch[0]):
                found = True
                break
        if found:
            break
    assert found
    r.close()


def test_python_fallback_matches_layout(shard, monkeypatch):
    path, imgs = shard
    import femasr_tpu.native.shardstore as ss
    monkeypatch.setattr(ss, '_get_lib', lambda: None)
    r = ss.ShardStoreReader(path)
    np.testing.assert_array_equal(r.read(2), imgs[2][1])
    batch = r.sample_batch([1, 3], crop=24, seed=1)
    assert batch.shape == (2, 24, 24, 3)


def test_make_shard_from_folder(tmp_path):
    import cv2
    rng = np.random.default_rng(1)
    src = tmp_path / 'imgs'
    src.mkdir()
    for i in range(3):
        cv2.imwrite(str(src / f'a{i}.png'),
                    (rng.random((32, 32, 3)) * 255).astype(np.uint8))
    out = str(tmp_path / 'pack.fmrs')
    make_shard_from_folder(str(src), out)
    r = ShardStoreReader(out)
    assert len(r) == 3
    img = r.read(0)
    ref = cv2.cvtColor(cv2.imread(str(src / 'a0.png')), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(img, ref)


def test_dataset_over_shard(tmp_path):
    import cv2
    from femasr_tpu.data import BSRGANTrainDataset
    from femasr_tpu.utils.file_client import FileClient
    rng = np.random.default_rng(2)
    src = tmp_path / 'imgs'
    src.mkdir()
    for i in range(2):
        cv2.imwrite(str(src / f'b{i}.png'),
                    (rng.random((160, 160, 3)) * 255).astype(np.uint8))
    shard_path = str(tmp_path / 'train.fmrs')
    make_shard_from_folder(str(src), shard_path)

    ds = BSRGANTrainDataset({'phase': 'train', 'scale': 4,
                             'dataroot_gt': shard_path, 'gt_size': 128,
                             'on_device_degradation': True,
                             'io_backend': {'type': 'disk'}})
    assert len(ds) == 2
    assert ds[0]['gt'].shape == (128, 128, 3)

    fc = FileClient('shard', db_paths=shard_path)
    img = fc.get('b0')
    assert img.shape == (160, 160, 3)


def test_writer_rejects_oversize_key(tmp_path):
    from femasr_tpu.native.shardstore import ShardStoreWriter
    w = ShardStoreWriter(str(tmp_path / 'k.fmrs'))
    with pytest.raises(ValueError, match='63'):
        w.add('x' * 80, np.zeros((4, 4, 3), np.uint8))
    w.add('ok', np.zeros((4, 4, 3), np.uint8))
    w.close()


def test_sample_batch_rejects_nonpositive_crop(shard):
    path, _ = shard
    r = ShardStoreReader(path)
    with pytest.raises(ValueError, match='crop'):
        r.sample_batch([0], crop=0)
    r.close()


def test_truncated_shard_fails_cleanly(tmp_path):
    """A shard cut mid-index must raise IOError at open, not SIGSEGV on
    first access (C++ bounds validation)."""
    from femasr_tpu.native.shardstore import (ShardStoreReader,
                                              ShardStoreWriter,
                                              native_available)
    path = str(tmp_path / 't.fmrs')
    with ShardStoreWriter(path) as w:
        for i in range(4):
            w.add(f'i{i}', np.full((16, 16, 3), i, np.uint8))
    data = open(path, 'rb').read()
    bad = str(tmp_path / 'bad.fmrs')
    open(bad, 'wb').write(data[:16 + 40])  # magic+count intact, index cut
    if native_available():
        with pytest.raises(IOError):
            ShardStoreReader(bad)


def test_streaming_writer_roundtrip(tmp_path):
    """Post-streaming-rewrite: bytes land where the index says."""
    from femasr_tpu.native.shardstore import ShardStoreReader, ShardStoreWriter
    rng = np.random.default_rng(9)
    imgs = [(f'k{i}', (rng.random((8 + i, 10, 3)) * 255).astype(np.uint8))
            for i in range(5)]
    path = str(tmp_path / 's.fmrs')
    with ShardStoreWriter(path) as w:
        for k, im in imgs:
            w.add(k, im)
    assert not os.path.exists(path + '.data.tmp')
    r = ShardStoreReader(path)
    assert r.keys() == [k for k, _ in imgs]
    for i, (_, im) in enumerate(imgs):
        np.testing.assert_array_equal(r.read(i), im)
    r.close()
