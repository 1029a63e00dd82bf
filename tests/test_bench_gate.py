"""The bench harness's round-over-round regression gate, pinned as a
pure function (no Spark): the dual cal+latency normalization decides
what gets alarmed on, so its edge cases deserve the same treatment as
query logic — a silently-broken gate reads as "no regressions".
"""

from __future__ import annotations

from bench import flag_regressions

# A prior round where every query took exactly its normalized value
# at cal=1.0, lat=0.1 (so prev_lat_norm = 10x prev_norm).
PREV = {"qa_small": 1.0, "qb_big": 8.0, "qc_stream": 2.0, "qd_new": 1.0}
PREV_LAT = {k: v * 10 for k, v in PREV.items()}


def _gate(timings, cal=1.0, lat=0.1, prev_lat=PREV_LAT, changed=()):
    return flag_regressions(
        timings, PREV, prev_lat, cal, lat, {"qc_stream"}, changed
    )


def test_flat_run_flags_nothing():
    reg, cal_only = _gate({k: v for k, v in PREV.items()})
    assert reg == {} and cal_only == {}


def test_genuine_regression_flags_under_both_normalizations():
    # 2x the work: grows under cal AND lat normalization
    reg, cal_only = _gate({"qa_small": 2.0, "qb_big": 8.0})
    assert set(reg) == {"qa_small"} and cal_only == {}
    prev, cur = reg["qa_small"]
    assert prev == 1.0 and cur == 2.0


def test_latency_shift_is_exonerated_not_alarmed():
    # the r9 driver scenario: raw time doubled, scan probe flat, but
    # the latency probe ALSO doubled (0.1 -> 0.2) — lat-normalized
    # time is unchanged, so the flag is informational only
    reg, cal_only = _gate({"qa_small": 2.0}, cal=1.0, lat=0.2)
    assert reg == {} and set(cal_only) == {"qa_small"}


def test_small_absolute_deltas_never_qualify():
    # +40% but only +0.4 probe units: under the 0.5 absolute floor
    reg, cal_only = _gate({"qa_small": 1.4})
    assert reg == {} and cal_only == {}


def test_streaming_and_changed_queries_are_excluded():
    reg, _ = _gate(
        {"qc_stream": 10.0, "qd_new": 10.0}, changed=("qd_new",)
    )
    assert reg == {}


def test_missing_lat_history_falls_back_to_cal_only_gate():
    # first run after the lat probe landed: prior report has no
    # queries_lat_norm — the cal gate must still alarm by itself
    reg, cal_only = _gate({"qa_small": 2.0}, prev_lat={})
    assert set(reg) == {"qa_small"} and cal_only == {}


def test_no_calibration_or_no_history_disables_the_gate():
    assert flag_regressions(
        {"qa_small": 9.0}, PREV, PREV_LAT, 0.0, 0.1, set(), ()
    ) == ({}, {})
    assert flag_regressions(
        {"qa_small": 9.0}, {}, {}, 1.0, 0.1, set(), ()
    ) == ({}, {})


def test_uniform_environment_shift_divides_out():
    # everything (queries AND both probes) 3x slower: normalized
    # times are unchanged — nothing flags
    reg, cal_only = _gate(
        {k: v * 3 for k, v in PREV.items()}, cal=3.0, lat=0.3
    )
    assert reg == {} and cal_only == {}


def test_flat_raw_time_is_exonerated_regardless_of_normalization():
    """The r10-driver phantom shape (qx38 1.15->1.17 s raw flagged as
    a 'normalized regression'): the cal probe moved under the query,
    so cal-normalized time grew >25%, but RAW time is flat. With the
    base's raw map available the candidate must be demoted — no lat
    history needed (the driver base that manufactured these had one,
    but the rule must stand alone)."""
    reg, cal_only = flag_regressions(
        {"qa_small": 1.05},          # raw +5%
        {"qa_small": 1.0},           # prev_norm at cal=1.0
        {},                          # no lat history
        0.6,                         # cal probe got 40% faster
        0.1,
        set(),
        (),
        prev_raw={"qa_small": 1.0},
    )
    assert reg == {} and set(cal_only) == {"qa_small"}


def test_real_raw_growth_is_not_exonerated_by_the_raw_rule():
    """+30% raw is past the 10% raw-delta bar: with no lat history the
    candidate must still ALARM — the raw rule only clears flat-raw
    phantoms, it must never swallow genuine growth."""
    reg, cal_only = flag_regressions(
        {"qa_small": 1.3},
        {"qa_small": 1.0},
        {},
        0.6,
        0.1,
        set(),
        (),
        prev_raw={"qa_small": 1.0},
    )
    assert set(reg) == {"qa_small"} and cal_only == {}


def test_raw_rule_disarms_when_environment_got_faster():
    """The review scenario: a container uniformly 25% faster AND a
    genuine +40% plan regression — raw time barely moves (the speedup
    pays for the regression), but BOTH normalizations confirm the
    growth. Flat raw only implies 'no regression' at constant
    environment speed, so the rule must disarm (probe ratio < 0.9)
    and let the latency gate alarm."""
    reg, cal_only = flag_regressions(
        {"qa": 2.1},                  # 2.0 * 1.4 * 0.75
        {"qa": 2.0},                  # prev_norm at prev cal 1.0
        {"qa": 20.0},                 # prev lat_norm at prev lat 0.1
        0.75,                         # this run's probes: 25% faster
        0.075,
        set(),
        (),
        prev_raw={"qa": 2.0},         # raw ratio 1.05 <= 1.10
        prev_cal_sec=1.0,             # 0.75 < 0.9 -> rule disarmed
    )
    assert set(reg) == {"qa"} and cal_only == {}


def test_raw_rule_stays_armed_at_equal_probe_speed():
    """The actual r10-driver phantom shape: the two runs' MEAN probes
    were equal (0.345 both) — the phantom came from within-run drift
    skewing individual normalized values. At probe ratio ~1 the rule
    is armed and the flat-raw candidate is demoted even though both
    normalizations 'confirm' the growth (they inherit the same skewed
    base)."""
    reg, cal_only = flag_regressions(
        {"qa": 2.1},
        {"qa": 1.0},                  # base norm skewed low by drift
        {"qa": 10.0},                 # lat norm equally skewed
        1.0,
        0.1,
        set(),
        (),
        prev_raw={"qa": 2.0},
        prev_cal_sec=1.0,
    )
    assert reg == {} and set(cal_only) == {"qa"}


def test_raw_rule_disarms_on_latency_speedup_too():
    """The symmetric hazard (second review pass): small queries are
    job-count-dominated, so a scheduler-latency speedup can pay for a
    genuine regression's extra jobs, leaving raw flat while the scan
    probe is unchanged. The arming condition must watch BOTH probes:
    with the lat probe 2x faster the raw rule disarms, and the lat
    gate — which sees the growth the speedup hid — alarms. (With both
    probes flat the same numbers are raw-exonerated; flat-raw
    candidacy then requires a drift-skewed base, which is exactly the
    case the rule exists for.)"""
    kw = dict(
        streaming=set(),
        changed=(),
        prev_raw={"qa": 2.0},         # raw ratio 1.05: flat
        prev_cal_sec=1.0,
    )
    # base prev_norm skewed low by within-run drift (p=1.0 while
    # raw/cal = 2.0) — the candidate shape
    reg, cal_only = flag_regressions(
        {"qa": 2.1},
        {"qa": 1.0},
        {"qa": 100.0},                # self-consistent lat norm: 2.0/0.02
        1.0,                          # scan probe unchanged -> no cal disarm
        0.01,                         # latency probe 2x faster -> DISARM
        prev_lat_sec=0.02,
        **kw,
    )
    # lat-normalized growth: (2.1/0.01)/100 = 2.1 > 1.25 -> alarm
    assert set(reg) == {"qa"} and cal_only == {}
    # control: latency probe unchanged -> armed -> demoted
    reg, cal_only = flag_regressions(
        {"qa": 2.1},
        {"qa": 1.0},
        {"qa": 100.0},
        1.0,
        0.02,
        prev_lat_sec=0.02,
        **kw,
    )
    assert reg == {} and set(cal_only) == {"qa"}


def test_disarmed_flat_raw_without_lat_history_demotes_not_alarms():
    """Disarmed raw rule + flat raw + a base predating the latency
    probe: positive flat-raw evidence with no probe to confirm the
    growth direction must stay VISIBLE but never alarm — alarming
    here would resurrect the phantom class the rule exists to kill."""
    reg, cal_only = flag_regressions(
        {"qa": 2.1},
        {"qa": 1.0},
        {},                           # no lat history (r8-era base)
        0.75,                         # scan probe 25% faster -> disarmed
        0.075,
        set(),
        (),
        prev_raw={"qa": 2.0},         # raw ratio 1.05: flat
        prev_cal_sec=1.0,
    )
    assert reg == {} and set(cal_only) == {"qa"}


def test_missing_prev_raw_falls_through_to_the_other_gates():
    """A base without a raw map (or a query absent from it) keeps the
    pre-existing behavior — the rule only ever demotes."""
    reg, _ = flag_regressions(
        {"qa_small": 1.05}, {"qa_small": 1.0}, {}, 0.6, 0.1, set(), ()
    )
    assert set(reg) == {"qa_small"}


# ---- wave (per-task dispatch) gate, r12 --------------------------


def test_dispatch_inflation_is_exonerated_by_the_wave_gate():
    """The qt35 mechanism (r11 triage): per-task dispatch inflation
    multiplies through a many-exchange/many-partition query while the
    scan probe (no dispatch sensitivity) and the 1-task lat probe
    (one dispatch per job) both stay flat — previously this shape
    ALARMED (grew under cal AND lat). With the 64-task wave probe
    inflated by the same per-task factor, the wave-normalized time is
    flat and the candidate is demoted."""
    reg, cal_only = flag_regressions(
        {"qt": 1.6},                  # raw +60% from dispatch alone
        {"qt": 1.0},                  # prev_norm at cal=1.0
        {"qt": 10.0},                 # prev_lat_norm at lat=0.1
        1.0,                          # scan probe flat
        0.1,                          # lat probe flat (1 dispatch/job)
        set(),
        (),
        prev_raw={"qt": 1.0},         # raw grew 60% -> not raw-flat
        prev_cal_sec=1.0,
        prev_lat_sec=0.1,
        prev_wave_norm={"qt": 25.0},  # prev wave_sec 0.04
        wave_sec=0.064,               # dispatch probe inflated 60% too
        prev_wave_sec=0.04,
    )
    assert reg == {} and set(cal_only) == {"qt"}


def test_genuine_regression_alarms_through_all_three_gates():
    """2x the work with every probe flat grows under cal, lat AND
    wave normalization — the wave gate must not swallow it."""
    reg, cal_only = flag_regressions(
        {"qt": 2.0},
        {"qt": 1.0},
        {"qt": 10.0},
        1.0,
        0.1,
        set(),
        (),
        prev_raw={"qt": 1.0},
        prev_cal_sec=1.0,
        prev_lat_sec=0.1,
        prev_wave_norm={"qt": 25.0},
        wave_sec=0.04,                # wave probe flat
        prev_wave_sec=0.04,
    )
    assert set(reg) == {"qt"} and cal_only == {}


def test_missing_wave_history_falls_back_to_the_r11_behavior():
    """A base predating queries_wave_norm (r10 and older): the gate
    decides on cal+lat exactly as before the wave wiring."""
    reg, cal_only = flag_regressions(
        {"qt": 2.0},
        {"qt": 1.0},
        {"qt": 10.0},
        1.0,
        0.1,
        set(),
        (),
        prev_raw={"qt": 1.0},
        prev_cal_sec=1.0,
        prev_lat_sec=0.1,
        wave_sec=0.08,                # current run measures wave...
        prev_wave_sec=None,           # ...but the base has none
    )
    assert set(reg) == {"qt"} and cal_only == {}


def test_wave_speedup_disarms_the_raw_rule():
    """Symmetric to the cal/lat disarm channels: a >10% faster
    dispatch environment can pay for a genuine regression's extra
    tasks, leaving raw flat — the raw rule must disarm and the wave
    gate (which sees the growth) alarms."""
    reg, cal_only = flag_regressions(
        {"qt": 2.1},
        {"qt": 1.0},                  # drift-skewed base norm
        {},                           # no lat history
        1.0,                          # scan probe flat -> no cal disarm
        0.0,
        prev_raw={"qt": 2.0},         # raw ratio 1.05: flat
        prev_cal_sec=1.0,
        streaming=set(),
        changed=(),
        prev_wave_norm={"qt": 25.0},  # prev raw 2.0 / wave_sec 0.08
        wave_sec=0.04,                # dispatch 2x faster -> DISARM
        prev_wave_sec=0.08,
    )
    # wave-normalized growth: (2.1/0.04)/25 = 2.1 > 1.25 -> alarm
    assert set(reg) == {"qt"} and cal_only == {}


# ---- baseline selection ------------------------------------------


from bench import select_baseline

_CLEAN = {
    "sf": 0.1,
    "cal_noisy": False,
    "queries_norm": {"qa": 1.0},
    "queries": {"qa": 0.4},
}
_NOISY = {
    "sf": 0.1,
    "cal_noisy": True,
    "queries_norm": {"qa": 2.0},
    "queries": {"qa": 0.8},
}


def test_clean_on_disk_report_is_preferred():
    base, name = select_baseline(_CLEAN, [(10, _NOISY)], 0.1)
    assert base is _CLEAN and name == "bench_report.json"


def test_noisy_on_disk_defers_to_newest_committed_snapshot():
    """The r10 qm7 lesson: an untracked noisy driver run on disk must
    not outrank the committed solo snapshot."""
    old = dict(_CLEAN)
    base, name = select_baseline(_NOISY, [(9, old), (10, _CLEAN)], 0.1)
    assert base is _CLEAN and name == "BENCH_LOCAL_r10.json"


def test_clean_snapshot_outranks_fresher_noisy_snapshot():
    """A noisy snapshot's per-query norms carry drift skew (the r11
    lesson: three noisy runs in one session) — a positively-clean
    older snapshot is the better base."""
    base, name = select_baseline(None, [(10, _CLEAN), (11, _NOISY)], 0.1)
    assert base is _CLEAN and name == "BENCH_LOCAL_r10.json"


def test_legacy_snapshot_without_noise_field_is_not_clean():
    """r8-era snapshots predate cal_noisy: absence of the field must
    not read as a cleanliness claim — the newest snapshot wins on the
    noisy tier instead."""
    legacy = {k: v for k, v in _CLEAN.items() if k != "cal_noisy"}
    base, name = select_baseline(None, [(8, legacy), (11, _NOISY)], 0.1)
    assert base is _NOISY and name == "BENCH_LOCAL_r11.json"


def test_sf_mismatched_candidates_are_rejected():
    wrong_sf = {**_CLEAN, "sf": 0.01}
    base, name = select_baseline(wrong_sf, [(10, wrong_sf)], 0.1)
    assert base == {} and name is None


def test_noisy_on_disk_is_the_last_resort():
    """With no committed snapshot at this SF, a stamped noisy gate
    beats no gate."""
    base, name = select_baseline(
        _NOISY, [(10, {**_CLEAN, "sf": 0.01})], 0.1
    )
    assert base is _NOISY and name == "bench_report.json"


def test_absent_everything_disables_the_gate():
    assert select_baseline(None, [], 0.1) == ({}, None)


# ---- provenance stamping + snapshot discovery --------------------


from bench import _committed_snapshot_names, base_noisiness


def test_base_noisiness_is_tri_state():
    """A legacy base without cal_noisy must stamp UNKNOWN (None),
    never clean (False) — the advisor's r11 finding: the docstring
    promises noisy-tier bases are stamped, and an
    unknown-cleanliness base reported as clean breaks that promise."""
    legacy = {k: v for k, v in _CLEAN.items() if k != "cal_noisy"}
    assert base_noisiness(_CLEAN) is False
    assert base_noisiness(_NOISY) is True
    assert base_noisiness(legacy) is None
    # non-bool junk in the field is also unknown, not clean
    assert base_noisiness({**_CLEAN, "cal_noisy": "yes"}) is None
    # no base selected -> nothing compared -> no hazard to stamp
    assert base_noisiness({}) is False


def test_uncommitted_snapshot_files_are_not_candidates(tmp_path):
    """The advisor's r11 finding, tightened by the review pass:
    main() globbed ANY BENCH_LOCAL_r*.json in the repo dir, so an
    untracked local file silently became the gate's base — and the
    index (ls-files) would still admit a staged-but-uncommitted one.
    Discovery must list what is COMMITTED at HEAD."""
    import subprocess

    def git(*args):
        subprocess.run(
            ["git", "-C", str(tmp_path), "-c", "user.email=t@t",
             "-c", "user.name=t", *args],
            check=True,
            timeout=30,
        )

    git("init", "-q")
    committed = tmp_path / "BENCH_LOCAL_r09.json"
    committed.write_text("{}")
    git("add", "BENCH_LOCAL_r09.json")
    git("commit", "-qm", "snapshot")
    staged = tmp_path / "BENCH_LOCAL_r10.json"
    staged.write_text("{}")
    git("add", "BENCH_LOCAL_r10.json")  # staged, never committed
    untracked = tmp_path / "BENCH_LOCAL_r11.json"
    untracked.write_text("{}")
    names = _committed_snapshot_names(str(tmp_path))
    assert names == ["BENCH_LOCAL_r09.json"]


def test_snapshot_discovery_falls_back_without_git(tmp_path):
    """Outside a git repo (or when git errors) the bare listing is
    the documented fallback — a weaker-provenance gate still beats
    no gate."""
    (tmp_path / "BENCH_LOCAL_r09.json").write_text("{}")
    (tmp_path / "not_a_snapshot.json").write_text("{}")
    names = _committed_snapshot_names(str(tmp_path))
    assert names == ["BENCH_LOCAL_r09.json"]


# ---- randomized properties --------------------------------------


from hypothesis import given, settings
from hypothesis import strategies as st

_norms = st.dictionaries(
    st.sampled_from(["q1", "q2", "q3", "q4", "q5"]),
    st.floats(min_value=0.01, max_value=50, allow_nan=False),
    min_size=1,
)


@settings(max_examples=200, deadline=None)
@given(
    prev=_norms,
    env=st.floats(min_value=0.1, max_value=10, allow_nan=False),
    cal=st.floats(min_value=0.05, max_value=5, allow_nan=False),
    lat=st.floats(min_value=0.005, max_value=0.5, allow_nan=False),
)
def test_property_uniform_shift_never_flags(prev, env, cal, lat):
    """ANY uniform environment shift (every query and both probes
    scaled by the same factor) must divide out completely."""
    timings = {n: p * cal * env for n, p in prev.items()}
    reg, cal_only = flag_regressions(
        timings,
        prev,
        {n: p * cal / lat for n, p in prev.items()},
        cal * env,
        lat * env,
        set(),
        (),
    )
    assert reg == {} and cal_only == {}


@settings(max_examples=200, deadline=None)
@given(
    prev=_norms,
    skew=st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
    raw_ratio=st.floats(min_value=0.5, max_value=1.10, allow_nan=False),
    env=st.floats(min_value=0.9, max_value=3.0, allow_nan=False),
)
def test_property_flat_raw_never_alarms_when_armed(
    prev, skew, raw_ratio, env
):
    """For ANY drift-skewed base (prev_norm understated by `skew`),
    any flat raw movement (<=10%), and any armed environment (probes
    not >10% faster than the base's): the candidate may be demoted
    but must NEVER land in regressions_norm — the phantom class is
    structurally dead."""
    name = next(iter(prev))
    pr = prev[name]                      # base raw (cal was 1.0)
    t = pr * raw_ratio                   # flat raw
    reg, _ = flag_regressions(
        {name: t},
        {name: pr * skew},               # drift-understated norm
        {name: pr * 10 * skew},
        1.0 * env,                       # probes same or slower
        0.1 * env,
        set(),
        (),
        prev_raw={name: pr},
        prev_cal_sec=1.0,
        prev_lat_sec=0.1,
    )
    assert name not in reg


@settings(max_examples=200, deadline=None)
@given(
    prev=_norms,
    growth=st.floats(min_value=1.3, max_value=20, allow_nan=False),
)
def test_property_real_growth_with_stable_probes_always_flags(
    prev, growth
):
    """A query that genuinely does `growth`x the work while both
    probes are stable must be ALARMED (never merely exonerated),
    provided it clears the 0.5-probe-unit absolute floor."""
    name = next(iter(prev))
    timings = {name: prev[name] * growth}
    reg, cal_only = flag_regressions(
        timings,
        prev,
        {n: p * 10 for n, p in prev.items()},  # lat = cal/10
        1.0,
        0.1,
        set(),
        (),
    )
    if prev[name] * growth - prev[name] > 0.5:
        assert name in reg and name not in cal_only
    else:
        assert reg == {} and cal_only == {}
