"""Radio front-end abstractions (reference: ue/hdr/radio/radio.h:37-73
abstract radio + ue/src/radio/radio_uhd.cc UHD implementation).

Without RF hardware the deployment surface is IQ streams: FileRadio
replays captures / generated waveforms; ArrayRadio serves in-memory
subframes (the test path)."""

from .radio import ArrayRadio, FileRadio, Radio
from .socket_radio import IqPeer, SocketRadio
