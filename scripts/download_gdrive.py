#!/usr/bin/env python
"""Download a Google-Drive file by id.

Parity: /root/reference/scripts/download_gdrive.py (which passes the
non-existent `args.save_path` — fixed here).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from femasr_tpu.utils.download_util import download_file_from_google_drive

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--id', type=str, required=True, help='File id')
    parser.add_argument('--output', type=str, required=True, help='Save path')
    args = parser.parse_args()
    download_file_from_google_drive(args.id, args.output)
