"""C20 — size/duration formatting truth table (utils.py:226-254)."""

from pdf_extract_spark.reporting import format_duration, format_file_size


def test_format_file_size():
    assert format_file_size(0) == "0B"
    assert format_file_size(1023) == "1023B"
    assert format_file_size(1024) == "1.0KB"
    assert format_file_size(1536) == "1.5KB"
    assert format_file_size(1024 * 1024) == "1.0MB"
    assert format_file_size(int(2.5 * 1024 * 1024)) == "2.5MB"
    assert format_file_size(3 * 1024 * 1024 * 1024) == "3.0GB"


def test_format_duration():
    assert format_duration(0.42) == "0.42초"
    assert format_duration(0.999) == "1.00초"  # :.2f rounds, <1.0 branch
    assert format_duration(1.0) == "1초"
    assert format_duration(59.9) == "59초"     # int() truncation
    assert format_duration(61) == "1분 1초"
    assert format_duration(3600) == "1시간 0분 0초"
    assert format_duration(3725.8) == "1시간 2분 5초"


def test_estimate_processing_time():
    """utils.py:269-284 — ceil-div batching and the exact Korean strings."""
    from pdf_extract_spark.reporting import estimate_processing_time

    assert estimate_processing_time(100, 10, 30.0) == (10, "약 5분")
    assert estimate_processing_time(101, 10, 30.0) == (11, "약 5분")  # ceil
    assert estimate_processing_time(10, 10, 30.0) == (1, "1분 이내")
    assert estimate_processing_time(1000, 10, 40.0) == (100, "약 1시간 6분")
    # the hours branch always shows minutes, even zero
    assert estimate_processing_time(1200, 10, 30.0) == (120, "약 1시간 0분")
