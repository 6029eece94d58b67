"""Human-readable progress formatting (SURVEY.md §2.7 C20).

Faithful re-expressions of the reference's reporting helpers
(/root/reference/utils.py:226-254): binary-unit file sizes with one
decimal above bytes, and Korean-unit durations (초/분/시간) with the
reference's exact branching — sub-second durations keep two decimals,
longer ones are truncated to integer seconds before splitting.

Driver-side only by design (these format log lines and run reports —
never row data), but checked: tests/test_reporting.py pins the exact
strings, and the CLI run report uses them.
"""

from __future__ import annotations


def format_file_size(size_bytes: int) -> str:
    """utils.py:226-235 — B under 1 KiB, then KB/MB/GB with one decimal."""
    if size_bytes < 1024:
        return f"{size_bytes}B"
    if size_bytes < 1024 * 1024:
        return f"{size_bytes / 1024:.1f}KB"
    if size_bytes < 1024 * 1024 * 1024:
        return f"{size_bytes / (1024 * 1024):.1f}MB"
    return f"{size_bytes / (1024 * 1024 * 1024):.1f}GB"


def format_duration(duration_seconds: float) -> str:
    """utils.py:238-254 — '0.42초' under a second; otherwise integer
    seconds split into 시간/분/초, omitting leading zero units."""
    if duration_seconds < 1.0:
        return f"{duration_seconds:.2f}초"
    total_seconds = int(duration_seconds)
    hours = total_seconds // 3600
    minutes = (total_seconds % 3600) // 60
    seconds = total_seconds % 60
    if hours > 0:
        return f"{hours}시간 {minutes}분 {seconds}초"
    if minutes > 0:
        return f"{minutes}분 {seconds}초"
    return f"{seconds}초"


def estimate_processing_time(
    total_pages: int, batch_size: int, avg_batch_time: float = 30.0
) -> tuple[int, str]:
    """utils.py:269-284 — (total_batches, '약 X시간 Y분' estimate):
    ceil-div pages into batches, multiply by the average batch seconds,
    format hours/minutes with the reference's exact branching ('1분
    이내' floor under a minute; the hours branch always shows minutes)."""
    total_batches = (total_pages + batch_size - 1) // batch_size
    estimated_seconds = total_batches * avg_batch_time
    hours = int(estimated_seconds // 3600)
    minutes = int((estimated_seconds % 3600) // 60)
    if hours > 0:
        time_str = f"약 {hours}시간 {minutes}분"
    elif minutes > 0:
        time_str = f"약 {minutes}분"
    else:
        time_str = "1분 이내"
    return total_batches, time_str
