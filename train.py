#!/usr/bin/env python
"""Training entry point (parity with the reference `basicsr/train.py` CLI).

Usage:
    python train.py -opt options/train_FeMaSR_HQ_pretrain_stage.yml
    python train.py -opt options/train_FeMaSR_LQ_stage.yml --auto_resume
"""

import os.path as osp

from femasr_tpu.train.pipeline import train_pipeline

if __name__ == '__main__':
    root_path = osp.abspath(osp.join(__file__, osp.pardir))
    train_pipeline(root_path)
