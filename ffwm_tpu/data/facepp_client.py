"""Face++ thousand-landmark REST client (offline preprocessing helper).

Rebuild of data_process/{get_landmarks,face_plus_plus}.py: a resumable,
rate-limited, multi-threaded fetcher that stores one JSON per image. Network
access is required only for this offline step (the training pipeline itself
never touches the network).
"""

from __future__ import annotations

import base64
import json
import os
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from os.path import basename, join, splitext
from typing import Callable, Optional, Sequence

API_URL = "https://api-cn.faceplusplus.com/facepp/v1/face/thousandlandmark"


def _urllib_transport(url: str, data: bytes, timeout: float) -> bytes:
    """Default transport: one POST, returns the raw response body."""
    req = urllib.request.Request(url, data=data)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read()


class FacePPClient:
    def __init__(self, api_key: str, api_secret: str,
                 url: str = API_URL, qps: float = 1.0,
                 transport: Optional[Callable[[str, bytes, float], bytes]] = None,
                 clock: Callable[[], float] = time.time,
                 sleep: Callable[[float], None] = time.sleep):
        """``transport``/``clock``/``sleep`` are injectable so the throttle,
        retry, and resume logic is testable offline (tests/test_data.py);
        the defaults are the production urllib POST and wall clock."""
        self.api_key = api_key
        self.api_secret = api_secret
        self.url = url
        self.min_interval = 1.0 / qps
        self._transport = transport or _urllib_transport
        self._clock = clock
        self._sleep = sleep
        self._lock = threading.Lock()
        self._last = float("-inf")

    def _throttle(self):
        with self._lock:
            wait = self._last + self.min_interval - self._clock()
            if wait > 0:
                self._sleep(wait)
            self._last = self._clock()

    def fetch(self, image_path: str, retries: int = 3) -> Optional[dict]:
        with open(image_path, "rb") as f:
            b64 = base64.b64encode(f.read()).decode()
        data = urllib.parse.urlencode({
            "api_key": self.api_key,
            "api_secret": self.api_secret,
            "image_base64": b64,
            "return_landmark": "all",
        }).encode()
        for attempt in range(retries):
            self._throttle()
            try:
                return json.loads(self._transport(self.url, data, 30).decode())
            except (urllib.error.URLError, json.JSONDecodeError) as e:
                print(f"{basename(image_path)}: attempt {attempt + 1} failed ({e})")
        return None

    def fetch_dir(self, img_dir: str, out_dir: str, suffix_strip: int = 0,
                  workers: int = 4, files: Optional[Sequence[str]] = None):
        """Fetch landmarks for every image missing its JSON (resumable)."""
        os.makedirs(out_dir, exist_ok=True)
        files = files if files is not None else sorted(os.listdir(img_dir))

        def work(f):
            stem = f[:-suffix_strip] if suffix_strip else splitext(f)[0]
            out = join(out_dir, stem + ".json")
            if os.path.exists(out):
                return
            result = self.fetch(join(img_dir, f))
            if result is not None and "face" in result:
                with open(out, "w") as fp:
                    json.dump(result, fp)
            else:
                print(f"no face result for {f}")

        with ThreadPoolExecutor(workers) as pool:
            list(pool.map(work, files))
