"""Transcribed biquad frequency-response vectors from the reference's
biquad_filter.rs test mod (:899-1437).  The expected magnitudes/phases are
the reference's literal vectors (themselves cross-checked against Chrome
and Firefox), asserted at the reference's own 1e-6 tolerance.
"""

import numpy as np
import pytest

import webaudio_tpu as wa

FREQS = [400., 800., 1200., 1600., 2000., 2400., 2800., 3200., 3600., 4000.]

# (type, expected_mags, expected_phases) — biquad_filter.rs:1003-1414,
# all with frequency=2000, q=1, gain=3 at fs=44100
CASES = {
    "lowpass": (
        [1.023848056793213, 1.0948060750961304, 1.19772469997406,
         1.2522060871124268, 1.1220184564590454, 0.8600019216537476,
         0.6262584328651428, 0.46187180280685425, 0.3505324125289917,
         0.27358654141426086],
        [-0.18232205510139465, -0.3985414505004883, -0.691506564617157,
         -1.0987391471862793, -1.5707963705062866, -1.9669616222381592,
         -2.236342191696167, -2.4131083488464355, -2.533737897872925,
         -2.6204006671905518]),
    "highpass": (
        [0.0404227040708065, 0.17317812144756317, 0.42743849754333496,
         0.7974866628646851, 1.1220184564590454, 1.2458853721618652,
         1.2437469959259033, 1.208056092262268, 1.1714074611663818,
         1.1408127546310425],
        [2.959270715713501, 2.743051290512085, 2.4500861167907715,
         2.042853593826294, 1.570796251296997, 1.1746309995651245,
         0.9052504897117615, 0.7284843325614929, 0.6078547239303589,
         0.5211920142173767]),
    "bandpass": (
        [0.2025768756866455, 0.4271776080131531, 0.6805755496025085,
         0.9101988673210144, 1.0, 0.9370073676109314, 0.8193633556365967,
         0.7074796557426453, 0.6153367757797241, 0.5415573716163635],
        [1.3668076992034912, 1.129427433013916, 0.8222484588623047,
         0.42703235149383545, -6.948182118549084e-8, -0.3568341135978699,
         -0.6104966998100281, -0.7848706841468811, -0.9079831838607788,
         -0.9985077977180481]),
    "notch": (
        [0.979266345500946, 0.9041677117347717, 0.7326779365539551,
         0.4141714870929718, 6.948182118549084e-8, 0.3493095338344574,
         0.573274552822113, 0.7067337036132812, 0.7882643342018127,
         0.8406637907028198],
        [-0.20398865640163422, -0.4413689076900482, -0.7485478520393372,
         -1.1437640190124512, 1.570796251296997, 1.213962197303772,
         0.9602996110916138, 0.7859256267547607, 0.662813127040863,
         0.5722885727882385]),
    "allpass": (
        [1.0] * 10,
        [-0.40797731280326843, -0.8827378153800964, -1.4970957040786743,
         -2.2875280380249023, 3.141592502593994, 2.427924394607544,
         1.9205992221832275, 1.5718512535095215, 1.325626254081726,
         1.144577145576477]),
    "peaking": (
        [1.0145272016525269, 1.0657449960708618, 1.1736305952072144,
         1.330430030822754, 1.4125374555587769, 1.3534939289093018,
         1.2603179216384888, 1.1887166500091553, 1.1401562690734863,
         1.107250690460205],
        [0.06874943524599075, 0.13327200710773468, 0.17138442397117615,
         0.13011260330677032, -2.411762878296031e-8, -0.1131250336766243,
         -0.16162104904651642, -0.17184172570705414, -0.16679927706718445,
         -0.1567305326461792]),
    "lowshelf": (
        [1.411763310432434, 1.4004594087600708, 1.3577604293823242,
         1.2777900695800781, 1.1885021924972534, 1.1184993982315063,
         1.07305908203125, 1.045626163482666, 1.029238224029541,
         1.0192826986312866],
        [-0.050444066524505615, -0.10995279997587204, -0.17566977441310883,
         -0.22642207145690918, -0.24332194030284882, -0.23164276778697968,
         -0.2076151967048645, -0.18214666843414307, -0.15946431457996368,
         -0.1404205560684204]),
    "highshelf": (
        [1.0005483627319336, 1.0086243152618408, 1.0403436422348022,
         1.1054534912109375, 1.1885021924972534, 1.2628861665725708,
         1.3163650035858154, 1.3509010076522827, 1.3724106550216675,
         1.385815143585205],
        [0.050444066524505615, 0.10995279997587204, 0.17566977441310883,
         0.22642207145690918, 0.24332194030284882, 0.23164276778697968,
         0.2076151967048645, 0.18214666843414307, 0.15946431457996368,
         0.1404205560684204]),
}


def _response(type_):
    ctx = wa.OfflineAudioContext(1, 128, 44100.0)
    f = ctx.create_biquad_filter(type=type_)
    f.frequency.set_value(2000.0)
    f.q.set_value(1.0)
    f.gain.set_value(3.0)
    mags = np.zeros(len(FREQS), np.float32)
    phases = np.zeros(len(FREQS), np.float32)
    f.get_frequency_response(np.array(FREQS), mags, phases)
    return mags, phases


@pytest.mark.parametrize("type_", sorted(CASES))
def test_ref_frequency_response(type_):
    mags, phases = _response(type_)
    exp_m, exp_p = CASES[type_]
    np.testing.assert_allclose(mags, np.float32(exp_m), atol=1e-6,
                               err_msg=f"{type_} magnitudes")
    np.testing.assert_allclose(phases, np.float32(exp_p), atol=1e-6,
                               err_msg=f"{type_} phases")


def test_ref_computed_freq():
    """biquad_filter.rs test_computed_freq (:920-932): +-100 cents is one
    semitone."""
    from webaudio_tpu.nodes.biquad_filter import _computed_freq

    assert abs(_computed_freq(440.0, 100.0) - 466.16) <= 0.01
    assert abs(_computed_freq(440.0, -100.0) - 415.3) <= 0.01


def test_ref_constructor_defaults_and_options():
    """biquad_filter.rs test_constructor (:934-973)."""
    ctx = wa.OfflineAudioContext(2, 1, 44100.0)
    b = ctx.create_biquad_filter()
    assert b.q.value == 1.0
    assert b.detune.value == 0.0
    assert b.gain.value == 0.0
    assert b.frequency.value == 350.0
    assert getattr(b.type, "value", b.type) == "lowpass"

    b2 = ctx.create_biquad_filter(type="highpass", q=2.0, detune=100.0,
                                  gain=1.0, frequency=3050.0)
    assert b2.q.value == 2.0
    assert b2.detune.value == 100.0
    assert b2.gain.value == 1.0
    assert b2.frequency.value == 3050.0


def test_ref_frequency_response_argument_lengths():
    """biquad_filter.rs test_frequency_response_arguments (:975-1001,
    should_panic -> raises): mismatched output lengths are rejected."""
    ctx = wa.OfflineAudioContext(2, 555, 44100.0)
    b = ctx.create_biquad_filter()
    with pytest.raises(Exception):
        b.get_frequency_response(np.array([0.0]), np.zeros(2, np.float32),
                                 np.zeros(1, np.float32))
    with pytest.raises(Exception):
        b.get_frequency_response(np.array([0.0]), np.zeros(1, np.float32),
                                 np.zeros(2, np.float32))


def test_ref_frequency_response_invalid_frequencies_nan():
    """biquad_filter.rs test_frequency_response_invalid_frequencies
    (:1415-1436): out-of-range analysis frequencies yield NaN."""
    ctx = wa.OfflineAudioContext(1, 128, 44100.0)
    f = ctx.create_biquad_filter(type="highshelf")
    f.frequency.set_value(2000.0)
    f.q.set_value(1.0)
    f.gain.set_value(3.0)
    mags = np.zeros(2, np.float32)
    phases = np.zeros(2, np.float32)
    f.get_frequency_response(np.array([-1.0, 22051.0]), mags, phases)
    assert np.isnan(mags).all()
    assert np.isnan(phases).all()
