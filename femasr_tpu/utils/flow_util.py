"""Optical-flow I/O (.flo format) + quantization helpers.

Parity: /root/reference/basicsr/utils/flow_util.py (flowread:6, flowwrite:50,
quantize_flow:77, dequantize_flow:99).
"""

from __future__ import annotations

import numpy as np

_FLO_MAGIC = 202021.25


def flowread(flow_path: str, quantize: bool = False, concat_axis: int = 0,
             *args, **kwargs) -> np.ndarray:
    """Read a .flo file (or a quantized dx/dy image pair)."""
    if quantize:
        import cv2
        assert concat_axis in [0, 1]
        cat_flow = cv2.imread(flow_path, cv2.IMREAD_UNCHANGED)
        if cat_flow.ndim != 2:
            raise IOError(f'{flow_path} is not a valid quantized flow file, '
                          f'its dimension is {cat_flow.ndim}.')
        assert cat_flow.shape[concat_axis] % 2 == 0
        dx, dy = np.split(cat_flow, 2, axis=concat_axis)
        return dequantize_flow(dx, dy, *args, **kwargs)

    with open(flow_path, 'rb') as f:
        try:
            header = np.fromfile(f, np.float32, 1)[0]
        except Exception:
            raise IOError(f'Invalid flow file: {flow_path}')
        if header != _FLO_MAGIC:
            raise IOError(f'Invalid flow file: {flow_path}, '
                          'header does not contain PIEH')
        w = int(np.fromfile(f, np.int32, 1))
        h = int(np.fromfile(f, np.int32, 1))
        flow = np.fromfile(f, np.float32, w * h * 2).reshape(h, w, 2)
    return flow.astype(np.float32)


def flowwrite(flow: np.ndarray, filename: str, quantize: bool = False,
              concat_axis: int = 0, *args, **kwargs) -> None:
    """Write optical flow to a .flo file (or quantized image)."""
    if not quantize:
        with open(filename, 'wb') as f:
            np.array([_FLO_MAGIC], np.float32).tofile(f)
            h, w = flow.shape[:2]
            np.array([w, h], np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
        return
    import cv2
    assert concat_axis in [0, 1]
    dx, dy = quantize_flow(flow, *args, **kwargs)
    dxdy = np.concatenate((dx, dy), axis=concat_axis)
    cv2.imwrite(filename, dxdy)


def quantize_flow(flow: np.ndarray, max_val: float = 0.02,
                  norm: bool = True):
    """Quantize flow to [0, 255] uint8 (flow_util.py:77-96)."""
    h, w, _ = flow.shape
    dx, dy = flow[..., 0], flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    flow_comps = [_quantize(d, -max_val, max_val, 255, np.uint8)
                  for d in [dx, dy]]
    return tuple(flow_comps)


def dequantize_flow(dx: np.ndarray, dy: np.ndarray, max_val: float = 0.02,
                    denorm: bool = True) -> np.ndarray:
    """Recover flow from quantized maps (flow_util.py:99-121)."""
    assert dx.shape == dy.shape
    dx, dy = (_dequantize(d, -max_val, max_val, 255) for d in [dx, dy])
    if denorm:
        dx *= dx.shape[1]
        dy *= dx.shape[0]
    return np.dstack((dx, dy))


def _quantize(arr, min_val, max_val, levels, dtype=np.int64):
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f'levels must be a positive integer, but got {levels}')
    if min_val >= max_val:
        raise ValueError(f'min_val ({min_val}) must be smaller than '
                         f'max_val ({max_val})')
    arr = np.clip(arr, min_val, max_val) - min_val
    return np.minimum(np.floor(levels * arr / (max_val - min_val)).astype(dtype),
                      levels - 1)


def _dequantize(arr, min_val, max_val, levels):
    return (arr.astype(np.float64) + 0.5) * (max_val - min_val) / levels + min_val
