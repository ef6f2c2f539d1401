"""Fixed-shape gait mode schedules.

TPU-native re-expression of OCS2 ``ModeSchedule`` + the reference's
``GaitSchedule`` / ``ModeSequenceTemplate`` / ``LegLogic``
(legged_interface/src/gait/GaitSchedule.cpp:46-161,
ModeSequenceTemplate.cpp:49-130, LegLogic.cpp:131-424).

A schedule is a pair of fixed-size arrays (padded with +inf event times), so
every query (mode at time, per-leg contact flags, swing/stance windows) is a
branch-free gather that jits and vmaps.  Mode numbers follow
MotionPhaseDefinition.h:55-87:

    FLY = 0, R = 1, L = 2, STANCE = 3

and map to the 4 contact points [L_toe, R_toe, L_heel, R_heel]
(contactNames3DoF order, ModelSettings.h:62-64).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Fixed phase capacity of a schedule window.  Sized for the densest
# shipped gait: flying trot burns 10 phases/s (4 per 0.4 s period), and a
# window must hold [t - 1 s kept past, t + 2 s planner horizon] plus the
# whole-template extension granularity — 32 SATURATED during flying-trot
# runs from ~3 s in (round-5 measurement: occupancy pinned at 32/32 with
# last_event only ~1.5 s ahead, silently truncating the swing planner's
# far window and degrading late-horizon footholds).  56 holds ~4.5 s of
# flying trot; trot/stance use well under half.
MAX_PHASES = 56
NUM_FEET = 4

FLY, R_MODE, L_MODE, STANCE = 0, 1, 2, 3

# (4 modes, 4 feet) contact flag lookup (modeNumber2StanceLeg)
MODE_CONTACTS = np.array(
    [
        [0.0, 0.0, 0.0, 0.0],  # FLY
        [0.0, 1.0, 0.0, 1.0],  # R
        [1.0, 0.0, 1.0, 0.0],  # L
        [1.0, 1.0, 1.0, 1.0],  # STANCE
    ]
)

BIG_TIME = 1e9


class ModeSchedule(NamedTuple):
    """event_times (MAX_PHASES,) padded with BIG_TIME; modes (MAX_PHASES+1,).

    Phase p covers [event_times[p-1], event_times[p]) with mode modes[p];
    phase 0 covers (-inf, event_times[0]).  Padding phases repeat the last
    valid mode so queries beyond the window stay well-defined.
    """

    event_times: jnp.ndarray  # (MAX_PHASES,)
    modes: jnp.ndarray        # (MAX_PHASES+1,) int32


class GaitTemplate(NamedTuple):
    """A periodic mode sequence template (ModeSequenceTemplate parity).

    switching_times has n+1 entries for n modes, padded; duration is the
    template period."""

    switching_times: jnp.ndarray  # (T_MAX+1,)
    modes: jnp.ndarray            # (T_MAX,) int32
    n_modes: jnp.ndarray          # scalar int32
    duration: jnp.ndarray         # scalar


T_MAX = 8


def make_template(mode_names, switching_times, dtype=jnp.float32) -> GaitTemplate:
    names = {"FLY": FLY, "R": R_MODE, "L": L_MODE, "STANCE": STANCE}
    modes = [names[m] if isinstance(m, str) else int(m) for m in mode_names]
    n = len(modes)
    st = list(map(float, switching_times))
    assert len(st) == n + 1
    pad_m = modes + [modes[-1]] * (T_MAX - n)
    pad_t = st + [st[-1]] * (T_MAX - n)
    return GaitTemplate(
        switching_times=jnp.asarray(pad_t, dtype),
        modes=jnp.asarray(pad_m, dtype=jnp.int32),
        n_modes=jnp.asarray(n, dtype=jnp.int32),
        duration=jnp.asarray(st[-1] - st[0], dtype),
    )


def rotate_template(template: GaitTemplate, j) -> GaitTemplate:
    """Rotate a periodic template so mode index ``j`` (traced) comes first —
    the fixed-shape tool for phase-continuous re-tiling: extending a live
    gait must CONTINUE its pattern (GaitSchedule re-tiles from the stored
    timeline position, GaitSchedule.cpp:126-161), not restart at modes[0]."""
    n = template.n_modes
    i = jnp.arange(T_MAX)
    src = jnp.where(i < n, (i + j) % jnp.maximum(n, 1), n - 1)
    modes = template.modes[src]
    # rotated durations -> cumulative switching times from 0
    dur = template.switching_times[1:] - template.switching_times[:-1]  # (T_MAX,)
    dur_rot = jnp.where(i < n, dur[src], 0.0)
    sw = jnp.concatenate([jnp.zeros(1, dur.dtype), jnp.cumsum(dur_rot)])
    return template._replace(switching_times=sw, modes=modes)


def scale_template(template: GaitTemplate, scale) -> GaitTemplate:
    """Scale a template's period by ``scale`` (domain sweeps over gait
    cadence, BASELINE config 5) — switching times are data, so this jits
    and vmaps."""
    return template._replace(
        switching_times=template.switching_times * scale,
        duration=template.duration * scale,
    )


# the four named gaits of legged_controllers/config/hunter/gait.info
STANCE_GAIT = lambda: make_template(["STANCE"], [0.0, 0.5])
TROT_GAIT = lambda: make_template(["L", "R"], [0.0, 0.3, 0.6])
STANDING_TROT_GAIT = lambda: make_template(
    ["L", "STANCE", "R", "STANCE"], [0.0, 0.25, 0.3, 0.55, 0.6]
)
FLYING_TROT_GAIT = lambda: make_template(
    ["L", "FLY", "R", "FLY"], [0.0, 0.15, 0.2, 0.35, 0.4]
)


def tile_template(template: GaitTemplate, start_time, final_time,
                  lead_mode=STANCE, lead_until=None) -> ModeSchedule:
    """Tile a periodic template over [start_time, final_time]
    (GaitSchedule::tileModeSequenceTemplate:126-161 re-expressed fixed-shape).

    Layout: event_times[k] = t0 + k-th template boundary; phase p covers
    [event_times[p-1], event_times[p]) with mode modes[p].  modes[0] (before
    t0) continues the template backwards — unless ``lead_until`` is given, in
    which case everything before t0 = lead_until is ``lead_mode`` (the
    phase-transition stance of insertModeSequenceTemplate,
    GaitSchedule.cpp:57-89).
    """
    k = jnp.arange(MAX_PHASES)
    n = template.n_modes
    period = template.duration
    cyc = k // n
    idx = k - cyc * n  # k mod n without dynamic shapes
    t0 = start_time if lead_until is None else lead_until
    events = t0 + cyc * period + (template.switching_times[idx] - template.switching_times[0])

    # modes[p] for p >= 1 is the template mode of the interval starting at
    # event_times[p-1]
    modes_body = template.modes[idx]
    if lead_until is not None:
        first_mode = jnp.asarray(lead_mode, dtype=jnp.int32)
    else:
        first_mode = template.modes[n - 1]  # backward continuation

    # mask events beyond final horizon
    valid = events <= final_time + 1e-9
    events = jnp.where(valid, events, BIG_TIME)
    modes = jnp.concatenate([first_mode[None], modes_body])
    return ModeSchedule(event_times=events, modes=modes)


def compact_schedule(schedule: ModeSchedule, keep_from) -> ModeSchedule:
    """Shift out events strictly before ``keep_from`` (fixed shape).

    The reference's GaitSchedule keeps a deque and erases past phases as it
    re-tiles (GaitSchedule.cpp:94-121); a fixed MAX_PHASES array must do the
    same or the window saturates with history — a walking gait consumes an
    event every ~0.15 s, so without compaction the schedule stops extending
    after ~MAX_PHASES*0.15 s and the horizon tail degenerates to a constant
    single-support mode (measured: every walk fell at ~8.6-9.6 s regardless
    of speed).  Queries at times >= keep_from are unchanged: the phase
    containing keep_from becomes phase 0.
    """
    k = jnp.searchsorted(schedule.event_times, keep_from, side="left")
    idx = jnp.arange(MAX_PHASES)
    src = jnp.clip(idx + k, 0, MAX_PHASES - 1)
    events = jnp.where(idx + k < MAX_PHASES,
                       schedule.event_times[src], BIG_TIME)
    msrc = jnp.clip(jnp.arange(MAX_PHASES + 1) + k, 0, MAX_PHASES)
    modes = schedule.modes[msrc]
    return ModeSchedule(event_times=events, modes=modes)


def mode_at_time(schedule: ModeSchedule, t) -> jnp.ndarray:
    """modeAtTime — phase lookup by searchsorted (branch-free)."""
    p = jnp.searchsorted(schedule.event_times, t, side="right")
    return schedule.modes[p]


def contact_flags_at_time(schedule: ModeSchedule, t, dtype=jnp.float32) -> jnp.ndarray:
    """(4,) contact flags at time t (SwitchedModelReferenceManager::getContactFlags)."""
    mode = mode_at_time(schedule, t)
    return jnp.asarray(MODE_CONTACTS, dtype=dtype)[mode]


def contact_sequence(schedule: ModeSchedule, dtype=jnp.float32) -> jnp.ndarray:
    """(4, MAX_PHASES+1) per-leg contact flag per phase (extractContactFlags)."""
    return jnp.asarray(MODE_CONTACTS, dtype=dtype)[schedule.modes].T


def phase_index_at_time(schedule: ModeSchedule, t) -> jnp.ndarray:
    return jnp.searchsorted(schedule.event_times, t, side="right")


def swing_windows(schedule: ModeSchedule, horizon_start, horizon_end):
    """Per-leg, per-phase [start, stop] times of the contiguous contact/swing
    window containing each phase (LegLogic extractContactTimings +
    SwingTrajectoryPlanner::updateFootSchedule, fixed-shape).

    Returns (start_times, stop_times, contact_seq):
        start_times, stop_times: (4, MAX_PHASES+1)
        contact_seq: (4, MAX_PHASES+1) 1.0 where leg in contact
    Window boundaries clamp to [horizon_start, horizon_end] at the padded
    edges of the schedule.
    """
    import jax

    cs = contact_sequence(schedule)  # (4, P+1)
    P1 = cs.shape[1]
    # boundary time of phase p start: event_times[p-1] (phase 0 -> horizon_start)
    starts_of_phase = jnp.concatenate(
        [jnp.asarray(horizon_start)[None], schedule.event_times]
    )  # (P+1,)
    ends_of_phase = jnp.concatenate(
        [schedule.event_times, jnp.asarray(BIG_TIME)[None]]
    )  # (P+1,)
    ends_of_phase = jnp.minimum(ends_of_phase, horizon_end)

    # Window start = phase start of the first phase of the contiguous
    # equal-flag run containing p; window stop = phase end of the run's last
    # phase.  Both recurrences are "nearest flag-change boundary" lookups:
    # a cumulative max (resp. reverse cumulative min) of marked boundary
    # indices replaces the P1-step sequential scans — O(log P1) depth.
    # Sequential-scan oracle: tests/test_swing_parallel.py::_swing_windows_scan.
    ps = jnp.arange(P1)

    def one_leg(flags):
        b_fwd = jnp.concatenate(
            [jnp.ones((1,), bool), flags[1:] != flags[:-1]])
        idx_f = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(b_fwd, ps, -1))
        b_bwd = jnp.concatenate(
            [flags[:-1] != flags[1:], jnp.ones((1,), bool)])
        idx_b = jax.lax.associative_scan(jnp.minimum,
                                         jnp.where(b_bwd, ps, P1),
                                         reverse=True)
        return starts_of_phase[idx_f], ends_of_phase[idx_b]

    start_times, stop_times = jax.vmap(one_leg)(cs)
    return start_times, stop_times, cs


def swing_phase_fraction(schedule: ModeSchedule, leg, t, horizon_start, horizon_end):
    """Fraction through the current swing/stance window, plus window bounds."""
    starts, stops, cs = swing_windows(schedule, horizon_start, horizon_end)
    p = phase_index_at_time(schedule, t)
    s, e = starts[leg, p], stops[leg, p]
    frac = jnp.clip((t - s) / jnp.maximum(e - s, 1e-6), 0.0, 1.0)
    return frac, s, e, cs[leg, p]
