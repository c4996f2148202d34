"""Toy VOIP round trip over UDP (reference: examples/toy_webrtc.rs).

The reference runs a UDP echo server and a client that ships microphone
audio to it and plays back what returns.  This port runs both ends on
localhost in one process: virtual mic -> MediaStreamDestination ->
UDP socket -> echo server -> UDP socket -> PushStreamTrack (primed with a
silence jitter buffer, as real VOIP clients do) -> MediaStreamSource ->
speakers.
"""
import _common  # noqa: F401
import socket
import threading
import time

import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.devices import get_user_media_sync
from webaudio_tpu.media.streams import PushStreamTrack

PORT = 18452
FS = 48000.0

stop = threading.Event()


def echo_server(sock):
    """The reference's server mode: ship every packet straight back."""
    sock.settimeout(0.1)
    n = 0
    while not stop.is_set():
        try:
            data, addr = sock.recvfrom(65536)
        except socket.timeout:
            continue
        sock.sendto(data, addr)
        n += 1
    print(f"server echoed {n} packets")


server_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
server_sock.bind(("127.0.0.1", PORT))
server = threading.Thread(target=echo_server, args=(server_sock,))
server.start()

# ---- client ----------------------------------------------------------------
client_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
client_sock.bind(("127.0.0.1", 0))
client_sock.settimeout(0.1)

ctx = wa.AudioContext(sample_rate=FS, sink_id="none", render_size_hint=4096)

# downlink first: received packets -> push track -> speakers.  Prime the
# track with a silence jitter buffer so the render loop never stalls while
# the first packets are in flight.
recv_track = PushStreamTrack(label="webrtc downlink")
for _ in range(8):
    recv_track.push(wa.AudioBuffer.from_array(
        np.zeros((1, 4096), np.float32), FS))
net_src = ctx.create_media_stream_track_source(recv_track)
net_src.connect(ctx.destination)

# uplink: virtual mic -> capture node -> UDP packets
mic = get_user_media_sync()
mic_src = ctx.create_media_stream_source(mic)
uplink = ctx.create_media_stream_destination()
mic_src.connect(uplink)

sent = received = 0


def uplink_pump():
    global sent
    track = uplink.stream.get_tracks()[0]
    while not stop.is_set():
        chunk = track.next_chunk(timeout=0.1)
        if chunk is None:
            continue
        mono = chunk.to_array()[:1].astype(np.float32)
        client_sock.sendto(mono.tobytes(), ("127.0.0.1", PORT))
        sent += 1


def downlink_pump():
    global received
    while not stop.is_set():
        try:
            data, _ = client_sock.recvfrom(65536)
        except socket.timeout:
            continue
        arr = np.frombuffer(data, np.float32).reshape(1, -1)
        recv_track.push(wa.AudioBuffer.from_array(arr, FS))
        received += 1


threads = [threading.Thread(target=uplink_pump),
           threading.Thread(target=downlink_pump)]
for t in threads:
    t.start()

time.sleep(1.5)
stop.set()
for t in threads:
    t.join()
ctx.close_sync()
server.join()
client_sock.close()
server_sock.close()

print(f"client sent {sent} packets, received {received} echoed packets "
      f"(played to the null sink)")
assert sent > 0 and received > 0, "no audio made the round trip"
