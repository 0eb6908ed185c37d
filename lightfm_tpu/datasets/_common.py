"""Download/cache plumbing for dataset fetchers (mirrors
``lightfm/datasets/_common.py``).  Uses urllib so no extra dependency is
needed; downloads are cached under ``~/lightfm_data`` like the reference."""

from __future__ import annotations

import os
import urllib.request


def get_data_dir():
    return os.path.join(os.path.expanduser("~"), "lightfm_data")


def create_data_dir(path):
    if not os.path.isdir(path):
        os.makedirs(path)


def download(url, dest_path):
    tmp_path = dest_path + ".part"
    with urllib.request.urlopen(url) as resp, open(tmp_path, "wb") as fd:
        while True:
            chunk = resp.read(2**20)
            if not chunk:
                break
            fd.write(chunk)
    os.replace(tmp_path, dest_path)


def get_data(data_home, url, dest_subdir, dest_filename, download_if_missing):
    if data_home is None:
        data_dir = os.path.join(get_data_dir(), dest_subdir)
    else:
        data_dir = os.path.join(os.path.abspath(data_home), dest_subdir)

    create_data_dir(data_dir)

    dest_path = os.path.join(data_dir, dest_filename)

    if not os.path.isfile(dest_path):
        if download_if_missing:
            download(url, dest_path)
        else:
            raise IOError("Dataset missing.")

    return dest_path
