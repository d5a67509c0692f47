"""Radio implementations.

The reference's abstract radio surface (radio.h:37-73): timed rx/tx,
gains, sample rates. Here the RX contract is ``rx_now(n) -> (samples,
timestamp)`` and TX is ``tx(samples, tx_time)`` — the file/array radios
implement the same contract so the receiver loop is front-end agnostic
(radio_uhd's timed-TX/burst handling becomes metadata on the stream).
"""

from __future__ import annotations

import numpy as np


class Radio:
    srate: float

    def rx_now(self, n: int) -> tuple[np.ndarray, float]:
        raise NotImplementedError

    def tx(self, samples: np.ndarray, tx_time: float) -> None:
        raise NotImplementedError

    def set_rx_srate(self, srate: float) -> None:
        self.srate = srate

    def seek(self, sample_pos: int) -> bool:
        """Reposition the RX stream (file/array radios only). Live radios
        return False; callers must then consume forward."""
        return False


class ArrayRadio(Radio):
    """Serves a preloaded IQ array (generated waveforms / captures in
    memory). TX is recorded with timestamps for assertions."""

    def __init__(self, samples: np.ndarray, srate: float):
        self.samples = np.asarray(samples, np.complex64).ravel()
        self.srate = srate
        self.pos = 0
        self.tx_log: list[tuple[float, np.ndarray]] = []

    def rx_now(self, n: int) -> tuple[np.ndarray, float]:
        ts = self.pos / self.srate
        end = self.pos + n
        out = np.zeros(n, np.complex64)
        avail = max(0, min(end, len(self.samples)) - self.pos)
        if avail > 0:
            out[:avail] = self.samples[self.pos : self.pos + avail]
        self.pos = end
        return out, ts

    def tx(self, samples: np.ndarray, tx_time: float) -> None:
        self.tx_log.append((tx_time, np.asarray(samples, np.complex64)))

    def seek(self, sample_pos: int) -> bool:
        self.pos = int(sample_pos)
        return True

    @property
    def exhausted(self) -> bool:
        return self.pos >= len(self.samples)


class FileRadio(ArrayRadio):
    """Replays a raw complex64 IQ capture file (the file-radio the
    reference lacks, SURVEY.md §7.1)."""

    def __init__(self, path: str, srate: float):
        data = np.fromfile(path, dtype=np.complex64)
        super().__init__(data, srate)


def write_iq(path: str, samples: np.ndarray) -> None:
    np.asarray(samples, np.complex64).ravel().tofile(path)
