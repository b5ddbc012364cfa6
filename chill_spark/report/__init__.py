from .junit import TestCase, TestReport, TestSuite
from .store_health import journal_freshness, store_health_report
from .suites import build_report

__all__ = [
    "TestCase", "TestReport", "TestSuite", "build_report",
    "journal_freshness", "store_health_report",
]
