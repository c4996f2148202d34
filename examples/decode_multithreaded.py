"""Decode audio files on a thread pool (reference:
examples/decode_multithreaded.rs — a 2-thread decode pool).

Decoding is host-side (native wahost/wacodec), so a ThreadPoolExecutor is
the Python analog; the decoders release the GIL inside the C++ hosts.
"""
import _common  # noqa: F401
from concurrent.futures import ThreadPoolExecutor
import glob
import time

import webaudio_tpu as wa

fs = 48000.0
ctx = wa.OfflineAudioContext(2, 1, fs)

files = sorted(
    glob.glob("/root/reference/samples/sample*.wav")
    + glob.glob("/root/reference/samples/sample.*")
    + glob.glob("/root/reference/samples/think-*.wav"))


def decode(path):
    try:
        buf = ctx.decode_audio_data_sync(path)
        return path, buf, None
    except Exception as exc:
        return path, None, exc


t0 = time.perf_counter()
with ThreadPoolExecutor(max_workers=2) as pool:
    results = list(pool.map(decode, files))
wall = time.perf_counter() - t0

ok = 0
for path, buf, err in results:
    name = path.rsplit("/", 1)[-1]
    if buf is not None:
        print(f"{name:28s} {buf.number_of_channels} ch  "
              f"{buf.duration:6.2f} s @ {buf.sample_rate:6.0f} Hz")
        ok += 1
    else:
        print(f"{name:28s} failed: {err}")
print(f"decoded {ok}/{len(files)} files on 2 threads in {wall:.2f} s")
