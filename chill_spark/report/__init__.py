from .junit import TestCase, TestReport, TestSuite
from .suites import build_report

__all__ = ["TestCase", "TestReport", "TestSuite", "build_report"]
