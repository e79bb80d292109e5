"""Data-prep one-off scripts: REDS regroup, tfrecord extract, HiFaceGAN prep.

The tfrecord test writes a real TFRecord file (framing + tf.Example wire
format encoded by hand) and checks the extractor recovers the exact pixels.
"""

import importlib.util
import os
import struct
import sys

import cv2
import numpy as np

SCRIPTS = os.path.join(os.path.dirname(__file__), '..', 'scripts',
                       'data_preparation')


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS, f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _varint(n):
    out = b''
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num, wire, payload):
    tag = _varint((num << 3) | wire)
    if wire == 2:
        return tag + _varint(len(payload)) + payload
    return tag + payload


def _example(shape, data):
    int64_list = b''.join(_field(1, 0, _varint(v)) for v in shape)
    shape_feat = _field(3, 2, int64_list)                  # Feature.int64_list
    data_feat = _field(1, 2, _field(1, 2, data))           # Feature.bytes_list
    entries = (_field(1, 2, _field(1, 2, b'shape') + _field(2, 2, shape_feat))
               + _field(1, 2, _field(1, 2, b'data') + _field(2, 2, data_feat)))
    return _field(1, 2, entries)                           # Example.features


def test_tfrecord_extract_roundtrip(tmp_path):
    mod = _load('extract_images_from_tfrecords')
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            for _ in range(3)]
    rec = tmp_path / 'fake.tfrecords'
    with open(rec, 'wb') as f:
        for img in imgs:
            payload = _example(img.shape, img.tobytes())
            f.write(struct.pack('<Q', len(payload)) + b'\0' * 4
                    + payload + b'\0' * 4)
    out = tmp_path / 'out'
    mod.convert_tfrecords(str(rec), str(out))
    files = sorted(os.listdir(out))
    assert len(files) == 3
    got = cv2.imread(str(out / files[1]))   # BGR on disk
    np.testing.assert_array_equal(got[:, :, ::-1], imgs[1])

    # FFHQ/StyleGAN layout: shape recorded as (C, H, W), data stored CHW —
    # must come out as the same HWC image (the element count is identical,
    # so only the channel-position heuristic can tell them apart)
    rec2 = tmp_path / 'ffhq.tfrecords'
    chw = imgs[0].transpose(2, 0, 1)
    with open(rec2, 'wb') as f:
        payload = _example(chw.shape, chw.tobytes())
        f.write(struct.pack('<Q', len(payload)) + b'\0' * 4
                + payload + b'\0' * 4)
    out2 = tmp_path / 'out_ffhq'
    mod.convert_tfrecords(str(rec2), str(out2), resolution=16)
    files2 = os.listdir(out2)
    assert len(files2) == 1
    got2 = cv2.imread(str(out2 / files2[0]))
    np.testing.assert_array_equal(got2[:, :, ::-1], imgs[0])


def test_regroup_reds(tmp_path):
    mod = _load('regroup_reds_dataset')
    train = tmp_path / 'train_sharp'
    val = tmp_path / 'val_sharp'
    (train / '000').mkdir(parents=True)
    for i in range(2):
        clip = val / f'{i:03d}'
        clip.mkdir(parents=True)
        (clip / 'frame.png').write_bytes(b'x')
    mod.regroup_reds_dataset(str(train), str(val))
    assert sorted(os.listdir(train)) == ['000', '240', '241']
    assert (train / '240' / 'frame.png').exists()


def test_hifacegan_templates(tmp_path):
    mod = _load('prepare_hifacegan_dataset')
    gt_dir = tmp_path / 'faces_gt'
    gt_dir.mkdir()
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    cv2.imwrite(str(gt_dir / 'a.png'), img)
    for deg in ('denoise', 'deblur', 'jpeg', '16x', 'face_renov'):
        lq_dir = tmp_path / f'faces_lq_{deg}'
        mod.create_training_dataset(deg, str(gt_dir), str(lq_dir))
        lq = cv2.imread(str(lq_dir / 'a.png'))
        assert lq is not None and lq.shape[2] == 3
        if deg != 'face_renov':   # face_renov resizes to 512
            assert lq.shape[:2] == (64, 64)
        assert not np.array_equal(lq, img)   # it degraded something
    # sr templates output 512x512 like the reference (fixed target size)
    mod.create_training_dataset('sr4x', str(gt_dir), str(tmp_path / 'sr'))
    sr = cv2.imread(str(tmp_path / 'sr' / 'a.png'))
    assert sr.shape[:2] == (512, 512)


def test_back_projection_improves_consistency(tmp_path):
    """Both MATLAB-parity modes must reduce ||down(SR) - LR|| (the quantity
    back-projection iterates on, backprojection.m / main_reverse_filter.m),
    and the CLI must process a folder end-to-end."""
    mod = _load('back_projection')
    rng = np.random.default_rng(0)
    gt = cv2.resize((rng.random((16, 16, 3)) * 255).astype(np.uint8),
                    (64, 64), interpolation=cv2.INTER_CUBIC)
    gt = gt.astype(np.float64) / 255.0
    im_l = mod._resize_to(gt, 16, 16)
    # a degraded "SR result": blurred + noisy
    im_h = cv2.GaussianBlur(gt.astype(np.float32), (5, 5), 1.2).astype(
        np.float64) + rng.normal(0, 0.01, gt.shape)

    def consistency(x):
        return float(np.mean((mod._resize_to(x, 16, 16) - im_l) ** 2))

    before = consistency(im_h)
    for fn in (lambda: mod.backprojection(im_h, im_l, 10),
               lambda: mod.reverse_filter(im_h, im_l, 4, 10)):
        out = fn()
        assert out.shape == im_h.shape
        assert consistency(out) < before * 0.5

    # CLI end-to-end
    lr_dir, sr_dir, out_dir = (tmp_path / d for d in ('lr', 'sr', 'out'))
    lr_dir.mkdir(); sr_dir.mkdir()
    cv2.imwrite(str(lr_dir / 'a.png'),
                (np.clip(im_l, 0, 1) * 255).astype(np.uint8))
    cv2.imwrite(str(sr_dir / 'a.png'),
                (np.clip(im_h, 0, 1) * 255).astype(np.uint8))
    argv = sys.argv
    sys.argv = ['back_projection.py', '--lr', str(lr_dir), '--sr',
                str(sr_dir), '--out', str(out_dir), '--mode', 'bp',
                '--iters', '3']
    try:
        mod.main()
    finally:
        sys.argv = argv
    assert (out_dir / 'a.png').exists()
