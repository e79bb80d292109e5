#!/usr/bin/env python
"""Offline evaluation entry point (parity with the reference `basicsr/test.py`).

Usage:
    python test.py -opt options/test_FeMaSR.yml
"""

import os.path as osp

from femasr_tpu.train.pipeline import test_pipeline

if __name__ == '__main__':
    root_path = osp.abspath(osp.join(__file__, osp.pardir))
    test_pipeline(root_path)
