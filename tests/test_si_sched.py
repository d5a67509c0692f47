"""SI scheduling windows and paging occasions (36.331 §5.2.3, 36.304 §7)."""

from srsue_tpu.rrc.si_sched import (
    SiConfig, paging_occasion, si_window, sib1_occasion,
)


def test_sib1_occasions():
    hits = [t for t in range(80) if sib1_occasion(t)]
    assert hits == [5, 25, 45, 65]


def test_si_window_first_message():
    cfg = SiConfig(si_window_len_sf=20, si_periodicity_rf=(16,))
    # SI message 1: x=0 -> window starts at sf0 of SFN mod 16 == 0
    assert si_window(cfg, 0, 0)
    assert si_window(cfg, 0, 19)
    assert not si_window(cfg, 0, 20)
    assert si_window(cfg, 0, 1600)  # next period (SFN 160)
    assert not si_window(cfg, 0, 900)  # SFN 90: not a period boundary


def test_si_window_second_message_offset():
    cfg = SiConfig(si_window_len_sf=20, si_periodicity_rf=(16, 32))
    # SI message 2: x = 20 -> starts at sf0 of SFN mod 32 == 2
    assert si_window(cfg, 1, 20)
    assert si_window(cfg, 1, 39)
    assert not si_window(cfg, 1, 40)
    assert not si_window(cfg, 1, 0)
    assert si_window(cfg, 1, 320 + 20)


def test_paging_occasions_periodic():
    hits = [t for t in range(0, 2 * 1280) if paging_occasion(t, ue_id=7)]
    assert len(hits) == 2
    assert hits[1] - hits[0] == 1280  # T=128 frames
    assert all(h % 10 == 9 for h in hits)  # PO subframe 9 for ns=1


def test_paging_different_ues_different_frames():
    h1 = [t for t in range(1280) if paging_occasion(t, ue_id=1)][0]
    h2 = [t for t in range(1280) if paging_occasion(t, ue_id=2)][0]
    assert h1 != h2
