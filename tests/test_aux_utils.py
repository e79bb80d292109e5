"""Auxiliary surface tests: arch_util, USM, flow I/O, NIQE, FID, converters."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_residual_block_no_bn():
    from femasr_tpu.ops.arch_util import ResidualBlockNoBN
    blk = ResidualBlockNoBN(num_feat=16)
    x = jnp.zeros((1, 8, 8, 16))
    params = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(params, jnp.ones((2, 8, 8, 16)))
    assert out.shape == (2, 8, 8, 16)


def test_flow_warp_identity_and_shift():
    from femasr_tpu.ops.arch_util import flow_warp
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 6, 7, 3), dtype=np.float32))
    zero_flow = jnp.zeros((1, 6, 7, 2))
    np.testing.assert_allclose(np.asarray(flow_warp(x, zero_flow)),
                               np.asarray(x), atol=1e-6)
    # shift by exactly +1 in x: output[y, x] = input[y, x+1]
    flow = jnp.zeros((1, 6, 7, 2)).at[..., 0].set(1.0)
    out = np.asarray(flow_warp(x, flow))
    np.testing.assert_allclose(out[0, :, :-1], np.asarray(x)[0, :, 1:],
                               atol=1e-6)
    np.testing.assert_allclose(out[0, :, -1], 0.0, atol=1e-6)  # zero pad


def test_usm_sharp_increases_contrast():
    import cv2
    from femasr_tpu.utils.img_process_util import usm_sharp
    rng = np.random.default_rng(1)
    base = rng.random((8, 8, 3)).astype(np.float32)
    img = cv2.resize(base, (64, 64), interpolation=cv2.INTER_CUBIC).clip(0, 1)
    out = np.asarray(usm_sharp(jnp.asarray(img)[None], radius=13)[0])
    assert out.shape == img.shape

    def grad_energy(a):
        return float(np.mean(np.abs(np.diff(a, axis=0))))

    assert grad_energy(out) > grad_energy(img)


def test_flow_io_roundtrip(tmp_path):
    from femasr_tpu.utils.flow_util import flowread, flowwrite
    rng = np.random.default_rng(2)
    flow = rng.normal(size=(6, 8, 2)).astype(np.float32)
    path = str(tmp_path / 'test.flo')
    flowwrite(flow, path)
    back = flowread(path)
    np.testing.assert_allclose(back, flow, atol=1e-6)


def test_niqe_orders_quality():
    """NIQE fit on pristine-like images must score noisy images worse."""
    import cv2
    from femasr_tpu.metrics.niqe import calculate_niqe, niqe_features
    rng = np.random.default_rng(3)

    def smooth_img(seed, size=192):
        r = np.random.default_rng(seed)
        base = r.random((12, 12, 3)).astype(np.float32)
        return cv2.resize(base, (size, size),
                          interpolation=cv2.INTER_CUBIC).clip(0, 1)

    # fit pristine stats from several clean images
    from femasr_tpu.utils.matlab_functions import rgb2ycbcr
    feats = []
    for s in range(6):
        g = np.asarray(rgb2ycbcr(smooth_img(s), y_only=True), np.float64) * 255
        feats.append(niqe_features(g))
    feats = np.concatenate(feats, 0)
    mu, cov = feats.mean(0), np.cov(feats.T)

    clean = smooth_img(100)
    noisy = np.clip(clean + rng.normal(0, 0.25, clean.shape), 0, 1).astype(
        np.float32)
    s_clean = calculate_niqe(clean, mu, cov)
    s_noisy = calculate_niqe(noisy, mu, cov)
    assert np.isfinite(s_clean) and np.isfinite(s_noisy)
    assert s_noisy > s_clean


def test_load_niqe_pris_params_layouts(tmp_path):
    """Loader accepts all three standard pristine-param artifacts: basicsr
    npz, MATLAB .mat, and our fitted mu/cov cache (VERDICT r2 item 5)."""
    from femasr_tpu.metrics.niqe import load_niqe_pris_params
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(36,))
    a = rng.normal(size=(36, 40))
    cov = a @ a.T / 40
    win = np.exp(-np.arange(-3, 4.)[:, None] ** 2
                 - np.arange(-3, 4.)[None, :] ** 2)

    p1 = tmp_path / 'niqe_pris_params.npz'  # basicsr layout, (1,36) mu
    np.savez(p1, mu_pris_param=mu[None], cov_pris_param=cov,
             gaussian_window=win)
    m, c, w = load_niqe_pris_params(str(p1))
    np.testing.assert_allclose(m, mu)
    np.testing.assert_allclose(c, cov)
    np.testing.assert_allclose(w, win)

    p2 = tmp_path / 'modelparameters.mat'  # original MATLAB release layout
    from scipy.io import savemat
    savemat(str(p2), {'pop_mu': mu[None], 'pop_cov': cov})
    m, c, w = load_niqe_pris_params(str(p2))
    np.testing.assert_allclose(m, mu)
    np.testing.assert_allclose(c, cov)
    assert w is None

    p3 = tmp_path / 'fitted.npz'  # our fit_niqe_params cache layout
    np.savez(p3, mu=mu, cov=cov)
    m, c, w = load_niqe_pris_params(str(p3))
    np.testing.assert_allclose(m, mu)
    assert w is None

    # a canonical-window score must run end-to-end through the factory
    from femasr_tpu.metrics.metric_util import create_metric
    metric = create_metric('niqe', pristine_params=str(p1))
    img = np.random.default_rng(1).random((256, 256, 3), dtype=np.float32)
    assert np.isfinite(metric(img))


def test_frechet_distance_properties():
    from femasr_tpu.metrics.fid import feature_statistics, frechet_distance
    rng = np.random.default_rng(4)
    f1 = rng.normal(size=(200, 16))
    f2 = rng.normal(loc=2.0, size=(200, 16))
    mu1, s1 = feature_statistics(f1)
    mu2, s2 = feature_statistics(f2)
    assert frechet_distance(mu1, s1, mu1, s1) < 1e-6
    assert frechet_distance(mu1, s1, mu2, s2) > 10


def test_fid_accepts_precomputed_stats_npz(tmp_path):
    """calculate_fid takes a stats .npz (calculate_fid_stats.py output) in
    place of either folder; FID(folder, its own stats) == 0."""
    import cv2
    from femasr_tpu.metrics.fid import (calculate_fid, extract_features,
                                        feature_statistics)
    rng = np.random.default_rng(5)
    folder = tmp_path / 'imgs'
    folder.mkdir()
    for i in range(4):
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(folder / f'{i}.png'), img)

    def fake_fn(batch):   # deterministic stand-in backbone
        return batch.reshape(batch.shape[0], -1)[:, :16]

    feats = extract_features(str(folder), fake_fn, batch_size=2)
    mu, sigma = feature_statistics(feats)
    npz = tmp_path / 'stats.npz'
    np.savez(npz, mu=mu, sigma=sigma)

    fid = calculate_fid(str(folder), str(npz), fake_fn, batch_size=2)
    assert abs(fid) < 1e-4

    # the stats CLI writes the same format
    import subprocess
    import sys
    repo = os.path.join(os.path.dirname(__file__), os.pardir)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, 'scripts', 'metrics',
                                      'calculate_fid_stats.py'), '--help'],
        capture_output=True, text=True)
    assert r.returncode == 0 and 'inception_weights' in r.stdout


def test_checkpoint_roundtrip_torch_layout():
    """flax -> torch-layout -> flax roundtrip preserves values."""
    torch = pytest.importorskip('torch')
    from femasr_tpu.models import FeMaSRNet
    from femasr_tpu.models.convert import (convert_femasr_checkpoint,
                                           femasr_param_mapping)
    from flax.traverse_util import flatten_dict

    net = FeMaSRNet(codebook_params=[[32, 32, 64]], LQ_stage=False)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3)))['params']
    flat = flatten_dict(params)

    mapping = femasr_param_mapping(codebook_params=[[32, 32, 64]],
                                   LQ_stage=False)
    sd = {}
    for path, (tkey, transform) in mapping.items():
        arr = np.asarray(flat[path])
        if transform.__name__ == '_conv_w':
            arr = arr.transpose(3, 2, 0, 1)
        elif transform.__name__ == '_lin_w':
            arr = arr.T
        sd[tkey] = arr
    back = convert_femasr_checkpoint(sd, codebook_params=[[32, 32, 64]],
                                     LQ_stage=False)
    back_flat = flatten_dict(back)
    assert set(back_flat) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(np.asarray(flat[k]), back_flat[k])


def test_lmdb_util_shard_alias(tmp_path):
    import cv2
    from femasr_tpu.native import ShardStoreReader
    from femasr_tpu.utils.lmdb_util import make_lmdb_from_imgs
    rng = np.random.default_rng(5)
    src = tmp_path / 'imgs'
    src.mkdir()
    for i in range(2):
        cv2.imwrite(str(src / f'x{i}.png'),
                    (rng.random((24, 24, 3)) * 255).astype(np.uint8))
    out = make_lmdb_from_imgs(str(src), str(tmp_path / 'pack.lmdb'))
    assert out.endswith('.fmrs')
    r = ShardStoreReader(out)
    assert len(r) == 2
    assert (tmp_path / 'pack.fmrs.meta_info.txt').exists()


def test_face_helper_warp_and_paste():
    """Geometry path of FaceRestorationHelper with supplied landmarks."""
    import cv2
    from femasr_tpu.utils.face_util import (FACE_TEMPLATE_512,
                                            FaceRestorationHelper)
    rng = np.random.default_rng(6)
    img = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
    helper = FaceRestorationHelper(upscale_factor=2, face_size=64)
    # a synthetic "face": the template scaled into a 64px box at offset 30,20
    lm = FACE_TEMPLATE_512 / 512 * 64 + np.array([30, 20], np.float32)
    helper.add_face_landmarks(lm, img)
    crops = helper.warp_crop_faces()
    assert len(crops) == 1 and crops[0].shape == (64, 64, 3)
    helper.add_restored_face(cv2.resize(crops[0], (64, 64)))
    out = helper.paste_faces_to_input_image()
    assert out.shape == (256, 256, 3)


def test_relay_watchdog_queue_logic(tmp_path, monkeypatch):
    """Watchdog state machine: phases run in priority order, completed
    once-only phases are not re-run, failing phases are capped at 3
    attempts, state persists across restarts. Uses stub commands and a
    stubbed probe — no TPU."""
    import importlib.util
    import sys as _sys
    spec = importlib.util.spec_from_file_location(
        'relay_watchdog',
        os.path.join(os.path.dirname(__file__), '..', 'scripts',
                     'relay_watchdog.py'))
    wd = importlib.util.module_from_spec(spec)
    _sys.modules['relay_watchdog'] = wd
    spec.loader.exec_module(wd)

    wd.STATE_FILE = str(tmp_path / 'state.json')
    calls = []
    wd.AGENDA = [
        ('ok_phase', [_sys.executable, '-c', 'print("fine")'], 30, None,
         False),
        ('bad_phase', [_sys.executable, '-c', 'raise SystemExit(1)'], 30,
         None, False),
        ('repeat_phase', [_sys.executable, '-c', 'print("again")'], 30,
         None, True),
    ]
    monkeypatch.setattr(wd, 'probe', lambda timeout_s=90: True)
    # the test itself runs under pytest; without this stub the co-run
    # guard would defer every phase and the loop would never run one
    monkeypatch.setattr(wd, 'pytest_running', lambda: False)
    monkeypatch.setattr(wd.time, 'sleep', lambda s: calls.append(('sleep', s)))
    monkeypatch.setenv('RELAY_WATCHDOG_BUDGET_S', '2')

    t = {'v': 0.0}
    real_time = wd.time.time
    # advance fake time 0.1s per call so the 2s budget ends the loop
    monkeypatch.setattr(wd.time, 'time', lambda: t.__setitem__(
        'v', t['v'] + 0.05) or t['v'])
    wd.main()

    state = wd.load_state()
    assert 'ok_phase' in state['done']
    assert 'bad_phase' not in state['done']
    assert state['attempts'].get('bad_phase', 0) <= 3
    # once-only phases never re-run after done; attempts recorded once
    assert state['attempts']['ok_phase'] == 1
