"""Minimal eNodeB + core-network emulator for hermetic end-to-end tests
(the reference tests only against live eNBs over the air, SURVEY.md §4.3;
this package is the in-memory replacement)."""
