"""Model-weight download/caching helpers.

Parity: /root/reference/basicsr/utils/download_util.py (load_file_from_url:
70-99). Downloads go to the torch-hub-style cache dir; in air-gapped
environments the cache is consulted and a clear error raised if absent.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse


def get_cache_dir() -> str:
    root = os.environ.get('FEMASR_HOME',
                          os.path.join(os.path.expanduser('~'), '.cache'))
    return os.path.join(root, 'femasr_tpu', 'weights')


def load_file_from_url(url: str, model_dir: str | None = None,
                       progress: bool = True,
                       file_name: str | None = None) -> str:
    """Return a local path for `url`, downloading into the cache if needed."""
    model_dir = model_dir or get_cache_dir()
    os.makedirs(model_dir, exist_ok=True)
    parts = urlparse(url)
    filename = file_name or os.path.basename(parts.path)
    cached_file = os.path.abspath(os.path.join(model_dir, filename))

    # also honor the torch hub cache used by the reference
    torch_hub = os.path.join(os.path.expanduser('~'), '.cache', 'torch', 'hub',
                             'checkpoints', filename)
    if not os.path.exists(cached_file) and os.path.exists(torch_hub):
        return torch_hub

    if not os.path.exists(cached_file):
        # tmp-write + atomic rename: an interrupted download must not
        # leave a truncated file that later calls treat as a valid cache
        tmp_file = cached_file + '.part'
        try:
            from urllib.request import urlretrieve
            print(f'Downloading: "{url}" to {cached_file}\n')
            urlretrieve(url, tmp_file)
            os.replace(tmp_file, cached_file)
        except Exception as e:
            if os.path.exists(tmp_file):
                os.remove(tmp_file)
            raise FileNotFoundError(
                f'Could not download {url} ({e}). Place the file manually at '
                f'{cached_file} or pass an explicit weight path.') from e
    return cached_file


def download_file_from_google_drive(file_id: str, save_path: str) -> None:
    """Download a Google-Drive file by id, following the confirm-token dance.

    Parity: /root/reference/basicsr/utils/download_util.py:11-67 (which uses
    `requests`; this uses stdlib urllib + cookies so it works in the same
    environments load_file_from_url does).
    """
    import http.cookiejar
    import re
    import shutil
    import urllib.request

    url = 'https://docs.google.com/uc?export=download'
    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(jar))

    with opener.open(f'{url}&id={file_id}') as resp:
        body = resp.read()
    token = None
    for cookie in jar:
        if cookie.name.startswith('download_warning'):
            token = cookie.value
    if token is None:  # newer interstitial page embeds the confirm token
        m = re.search(rb'confirm=([0-9A-Za-z_\-]+)', body)
        token = m.group(1).decode() if m else None

    final = f'{url}&id={file_id}' + (f'&confirm={token}' if token else '')
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    tmp_path = save_path + '.part'
    try:
        with opener.open(final) as resp, open(tmp_path, 'wb') as f:
            shutil.copyfileobj(resp, f)
        os.replace(tmp_path, save_path)
    except Exception:
        if os.path.exists(tmp_path):
            os.remove(tmp_path)
        raise
    print(f'Downloaded gdrive file {file_id} -> {save_path}')
