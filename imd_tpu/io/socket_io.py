"""Online visualization / steering socket (socket_io.c + sockutil.c).

The reference exposes a raw-TCP steering protocol checked once per
`socket_int` steps (check_socket dispatch: quit / restart / write
config / change params, VisIT style).  Here: a non-blocking line
protocol served from the host loop (call `poll` from Simulation.run's
on_interval hook):

    quit            -> graceful stop (checkpoint + end), like `stop` file
    write           -> checkpoint now
    eng             -> one .eng-style status line back
    temp <T>        -> retarget the thermostat temperature
    pic <nx> <ny>   -> binary f32 Ekin projection [nx*ny] back

All state changes go through a command queue the driver consumes - the
socket thread never touches device state.
"""

from __future__ import annotations

import queue
import socket
import threading
from typing import Optional

import numpy as np


class SocketServer:
    def __init__(self, port: int = 31050, host: str = "127.0.0.1"):
        self.commands: "queue.Queue[tuple]" = queue.Queue()
        self._replies: "queue.Queue[bytes]" = queue.Queue()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        while not self._stop.is_set():
            try:
                self._srv.settimeout(0.25)
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            with conn:
                buf = b""
                conn.settimeout(0.25)
                while not self._stop.is_set():
                    try:
                        data = conn.recv(4096)
                    except socket.timeout:
                        data = b""
                    except OSError:
                        break
                    if data:
                        buf += data
                        while b"\n" in buf:
                            line, buf = buf.split(b"\n", 1)
                            self.commands.put(tuple(
                                line.decode().strip().split()))
                    # flush replies
                    try:
                        while True:
                            conn.sendall(self._replies.get_nowait())
                    except queue.Empty:
                        pass
                    except OSError:
                        break
                    if not data and conn.fileno() < 0:
                        break

    def reply(self, payload: bytes):
        self._replies.put(payload)

    def close(self):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass


def poll(server: Optional[SocketServer], sim, state) -> bool:
    """Drain pending commands against a Simulation; returns True when the
    run should stop (check_socket dispatch, socket_io.c)."""
    if server is None:
        return False
    stop = False
    while True:
        try:
            cmd = server.commands.get_nowait()
        except queue.Empty:
            break
        if not cmd:
            continue
        op = cmd[0].lower()
        if op == "quit":
            sim.write_checkpoint(state, int(state.step))
            stop = True
        elif op == "write":
            sim.write_checkpoint(state, int(state.step))
        elif op == "eng":
            n = max(int(state.scene.n_atoms()), 1)
            ek = float(state.stats.tot_kin_energy)
            server.reply((f"step {int(state.step)} epot "
                          f"{float(state.epot_total) / n:.6e} ekin "
                          f"{ek:.6e}\n").encode())
        elif op == "temp" and len(cmd) > 1:
            sim.cfg.starttemp = sim.cfg.endtemp = float(cmd[1])
        elif op == "pic":
            from imd_tpu.io.pictures import project
            nx = int(cmd[1]) if len(cmd) > 1 else 64
            ny = int(cmd[2]) if len(cmd) > 2 else 64
            f, _ = project(state.scene, (nx, ny))
            server.reply(np.asarray(f, np.float32).tobytes())
    return stop
