#!/usr/bin/env python
"""Extract images from CelebA/FFHQ StyleGAN-style tfrecords.

Parity: /root/reference/scripts/data_preparation/extract_images_from_tfrecords.py,
re-implemented WITHOUT TensorFlow: a pure-Python TFRecord framing reader and
a minimal tf.Example wire-format parser (the records carry two features:
'shape' int64[3] and 'data' raw uint8 bytes). Output: PNG folder (the
reference's lmdb mode maps to our .fmrs shard store —
scripts/data_preparation/create_shard.py).
"""
import argparse
import glob
import os
import struct

import cv2
import numpy as np


def read_tfrecord_frames(path):
    """Yield raw payload bytes from a TFRecord file (skips CRC checks)."""
    with open(path, 'rb') as f:
        while True:
            head = f.read(8)
            if len(head) < 8:
                return
            (length,) = struct.unpack('<Q', head)
            f.read(4)  # length crc
            payload = f.read(length)
            if len(payload) < length:
                return
            f.read(4)  # data crc
            yield payload


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _parse_fields(buf):
    """Yield (field_number, wire_type, value) from a protobuf message."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:            # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 2:          # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:          # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        elif wire == 1:          # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f'unsupported wire type {wire}')
        yield field, wire, val


def parse_example(payload):
    """Minimal tf.Example parser -> {name: int64 list | bytes list}."""
    features = {}
    for f1, _, v1 in _parse_fields(payload):         # Example.features = 1
        if f1 != 1:
            continue
        for f2, _, v2 in _parse_fields(v1):          # Features.feature map
            if f2 != 1:
                continue
            name, ints, byts = None, [], []
            for fk, _, vk in _parse_fields(v2):      # map entry: key=1 val=2
                if fk == 1:
                    name = vk.decode()
                elif fk == 2:
                    for ft, _, vt in _parse_fields(vk):  # Feature oneof
                        if ft == 1:                       # BytesList
                            for fb, _, vb in _parse_fields(vt):
                                if fb == 1:
                                    byts.append(vb)
                        elif ft == 3:                     # Int64List
                            for fb, wb, vb in _parse_fields(vt):
                                if fb != 1:
                                    continue
                                if wb == 0:
                                    ints.append(vb)
                                else:                     # packed
                                    p = 0
                                    while p < len(vb):
                                        x, p = _read_varint(vb, p)
                                        ints.append(x)
            if name is not None:
                features[name] = byts if byts else ints
    return features


def convert_tfrecords(tf_pattern, save_path, resolution=None):
    os.makedirs(save_path, exist_ok=True)
    idx = 0
    for record in sorted(glob.glob(tf_pattern)):
        print('Processing record:', record)
        for payload in read_tfrecord_frames(record):
            feats = parse_example(payload)
            shape = feats['shape'][:3]
            img = np.frombuffer(feats['data'][0], dtype=np.uint8)
            # FFHQ/StyleGAN tfrecords store shape as (C, H, W); CelebA-style
            # ones as (H, W, C). The element count cannot disambiguate (the
            # product is the same) — use the channel position.
            if shape[0] in (1, 3) and shape[2] not in (1, 3):
                c, h, w = shape
                img = img.reshape(c, h, w).transpose(1, 2, 0)
            else:
                h, w, c = shape
                img = img.reshape(h, w, c)
            if resolution is not None and (h != resolution
                                           or w != resolution):
                continue
            img = img[:, :, ::-1]  # RGB -> BGR for cv2
            cv2.imwrite(os.path.join(save_path, f'{idx:08d}.png'), img)
            idx += 1
    print(f'extracted {idx} images -> {save_path}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('tfrecords', help='glob pattern of .tfrecords files')
    parser.add_argument('--save_path', required=True)
    parser.add_argument('--resolution', type=int, default=None,
                        help='keep only images at this resolution')
    args = parser.parse_args()
    convert_tfrecords(args.tfrecords, args.save_path, args.resolution)
