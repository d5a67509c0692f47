"""MAC layer — host-side protocol engine orchestrating the PHY kernels.

Re-creates the reference's ue/src/mac capability surface (SURVEY.md §2.2):
MAC PDU codec, DL/UL HARQ entities (softbuffer state as device arrays),
random access procedure, BSR/SR/PHR, logical-channel mux/demux.
"""
