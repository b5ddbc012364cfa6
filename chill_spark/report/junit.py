"""JUnit XML report model (Jenkins-plugin dialect).

A fresh minimal implementation of the testsuites/testsuite/testcase
XML shape the reference emits (junit/testReport.py:73-109,
TestReport.py:174-190): suites carry pass/fail/skip tallies; cases
carry an optional failure message; text is XML-sanitized. Round-trips
via ``from_xml`` for self-checking golden tests.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field


def _sanitize(s: str) -> str:
    """Strip characters invalid in XML 1.0 (junit/utils.py:30-63 intent)."""
    return "".join(
        ch
        for ch in s
        if ch in ("\t", "\n", "\r")
        or 0x20 <= ord(ch) <= 0xD7FF
        or 0xE000 <= ord(ch) <= 0xFFFD
    )


@dataclass
class TestCase:
    __test__ = False  # not a pytest class
    name: str
    classname: str = ""
    time: float = 0.0
    failure_message: str | None = None
    skipped: bool = False
    stdout: str | None = None

    @property
    def passed(self) -> bool:
        return self.failure_message is None and not self.skipped


@dataclass
class TestSuite:
    __test__ = False  # not a pytest class
    name: str
    cases: list[TestCase] = field(default_factory=list)

    def add(self, case: TestCase) -> None:
        self.cases.append(case)

    @property
    def tests(self) -> int:
        return len(self.cases)

    @property
    def failures(self) -> int:
        return sum(1 for c in self.cases if c.failure_message is not None)

    @property
    def skipped(self) -> int:
        return sum(1 for c in self.cases if c.skipped)

    def merge(self, other: TestSuite) -> None:
        """Merge same-named suites (junit/testSuite.py:62-87 behavior)."""
        self.cases.extend(other.cases)


@dataclass
class TestReport:
    __test__ = False  # not a pytest class
    suites: list[TestSuite] = field(default_factory=list)

    def suite(self, name: str) -> TestSuite:
        for s in self.suites:
            if s.name == name:
                return s
        s = TestSuite(name)
        self.suites.append(s)
        return s

    def merge(self, other: TestReport) -> None:
        for s in other.suites:
            self.suite(s.name).merge(s)

    @property
    def passed(self) -> bool:
        return all(su.failures == 0 for su in self.suites)

    def to_xml(self, pretty: bool = True) -> str:
        root = ET.Element("testsuites")
        for su in self.suites:
            el = ET.SubElement(
                root,
                "testsuite",
                name=_sanitize(su.name),
                tests=str(su.tests),
                failures=str(su.failures),
                skipped=str(su.skipped),
            )
            for c in su.cases:
                ce = ET.SubElement(
                    el,
                    "testcase",
                    name=_sanitize(c.name),
                    classname=_sanitize(c.classname),
                    time=f"{c.time:.3f}",
                )
                if c.failure_message is not None:
                    fe = ET.SubElement(ce, "failure")
                    fe.text = _sanitize(c.failure_message)
                if c.skipped:
                    ET.SubElement(ce, "skipped")
                if c.stdout:
                    se = ET.SubElement(ce, "system-out")
                    se.text = _sanitize(c.stdout)
        if pretty:
            ET.indent(root)
        return ET.tostring(root, encoding="unicode", xml_declaration=True)

    @classmethod
    def from_xml(cls, text: str) -> TestReport:
        root = ET.fromstring(text)
        rep = cls()
        for el in root.iter("testsuite"):
            su = rep.suite(el.get("name", ""))
            for ce in el.iter("testcase"):
                fe = ce.find("failure")
                se = ce.find("system-out")
                su.add(
                    TestCase(
                        name=ce.get("name", ""),
                        classname=ce.get("classname", ""),
                        time=float(ce.get("time", "0")),
                        failure_message=fe.text if fe is not None else None,
                        skipped=ce.find("skipped") is not None,
                        stdout=se.text if se is not None else None,
                    )
                )
        return rep

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_xml())
