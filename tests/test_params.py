"""SPS/PPS write→parse roundtrip tests."""

from x264vfw_tpu.bitstream.params import PPS, SPS, PROFILE_BASELINE, PROFILE_HIGH


def test_sps_roundtrip_baseline():
    s = SPS(
        profile_idc=PROFILE_BASELINE,
        constraint_set0=1,
        constraint_set1=1,
        level_idc=31,
        log2_max_frame_num_minus4=4,
        pic_order_cnt_type=2,
        max_num_ref_frames=2,
        pic_width_in_mbs_minus1=79,       # 1280
        pic_height_in_map_units_minus1=44,  # 720
    )
    s2 = SPS.from_rbsp(s.to_rbsp())
    assert s2 == s
    assert s2.width == 1280 and s2.height == 720
    assert s2.mb_width == 80 and s2.mb_height == 45


def test_sps_roundtrip_high_with_crop_and_vui():
    s = SPS(
        profile_idc=PROFILE_HIGH,
        level_idc=40,
        pic_order_cnt_type=0,
        log2_max_pic_order_cnt_lsb_minus4=4,
        max_num_ref_frames=4,
        pic_width_in_mbs_minus1=119,        # 1920
        pic_height_in_map_units_minus1=67,  # 1088 -> crop to 1080
        frame_cropping_flag=1,
        frame_crop_bottom_offset=4,
        vui_parameters_present_flag=1,
        sar_width=1, sar_height=1,
        video_signal_type_present_flag=1,
        video_full_range_flag=0,
        colour_description_present_flag=1,
        colour_primaries=1, transfer_characteristics=1, matrix_coefficients=1,
        timing_info_present_flag=1,
        num_units_in_tick=1, time_scale=60,
    )
    s2 = SPS.from_rbsp(s.to_rbsp())
    assert s2 == s
    assert s2.width == 1920 and s2.height == 1080


def test_sps_extended_sar():
    s = SPS(profile_idc=PROFILE_BASELINE, constraint_set0=1, constraint_set1=1,
            vui_parameters_present_flag=1, sar_width=33, sar_height=7)
    s2 = SPS.from_rbsp(s.to_rbsp())
    assert (s2.sar_width, s2.sar_height) == (33, 7)


def test_pps_roundtrip_cavlc():
    p = PPS(entropy_coding_mode_flag=0, pic_init_qp_minus26=-3,
            chroma_qp_index_offset=2, deblocking_filter_control_present_flag=1)
    p2 = PPS.from_rbsp(p.to_rbsp())
    assert p2 == p


def test_pps_roundtrip_high_ext():
    p = PPS(entropy_coding_mode_flag=1, transform_8x8_mode_flag=1,
            second_chroma_qp_index_offset=-2)
    p2 = PPS.from_rbsp(p.to_rbsp())
    assert p2 == p
