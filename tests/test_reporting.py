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
