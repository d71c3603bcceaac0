"""ArgParser tests mirroring the reference's 9 inline tests
(src/argparser.zig:211-408): happy path, custom delimiter, required args,
unknown arg, nested type with custom parse (+ missing-parse error), enums,
bool flags, help sentinel."""

import dataclasses
import enum
from typing import Optional

import pytest

from zig_weekend_raytracer_tpu.utils.argparser import (
    ArgParser,
    HelpPassedInArgs,
    InvalidArgumentFormat,
    InvalidArgumentValue,
    MissingCustomParseFn,
    MissingRequiredArgument,
    UnknownArgument,
)


class Color(enum.Enum):
    RED = "red"
    GREEN = "green"


@dataclasses.dataclass
class Point:
    x: float = 0.0
    y: float = 0.0

    @classmethod
    def parse(cls, text: str) -> "Point":
        a, b = text.split(",")
        return cls(float(a), float(b))


@dataclasses.dataclass
class NoParse:
    x: int = 0


@dataclasses.dataclass
class Args:
    width: int
    height: int = 100
    name: str = "out"
    ratio: float = 1.5
    flag: bool = False
    color: Color = Color.RED
    point: Point = dataclasses.field(default_factory=Point)
    maybe: Optional[int] = None


def test_happy_path():
    args = ArgParser(Args).parse(
        ["--width=400", "--height=300", "--name=render", "--ratio=2.25"]
    )
    assert args.width == 400
    assert args.height == 300
    assert args.name == "render"
    assert args.ratio == 2.25


def test_defaults_applied():
    args = ArgParser(Args).parse(["--width=10"])
    assert args.height == 100
    assert args.name == "out"
    assert args.maybe is None


def test_custom_delimiter():
    args = ArgParser(Args, delimiter=":").parse(["--width:42"])
    assert args.width == 42


def test_missing_required():
    with pytest.raises(MissingRequiredArgument):
        ArgParser(Args).parse([])


def test_unknown_argument():
    with pytest.raises(UnknownArgument):
        ArgParser(Args).parse(["--width=1", "--bogus=2"])


def test_invalid_format():
    with pytest.raises(InvalidArgumentFormat):
        ArgParser(Args).parse(["width=1"])
    with pytest.raises(InvalidArgumentFormat):
        ArgParser(Args).parse(["--width"])


def test_nested_custom_parse():
    args = ArgParser(Args).parse(["--width=1", "--point=3.0,4.0"])
    assert args.point == Point(3.0, 4.0)


def test_missing_custom_parse_fn():
    @dataclasses.dataclass
    class Bad:
        np_field: NoParse = dataclasses.field(default_factory=NoParse)

    with pytest.raises(MissingCustomParseFn):
        ArgParser(Bad).parse(["--np_field=whatever"])


def test_enum_values():
    args = ArgParser(Args).parse(["--width=1", "--color=green"])
    assert args.color is Color.GREEN
    with pytest.raises(InvalidArgumentValue) as e:
        ArgParser(Args).parse(["--width=1", "--color=blue"])
    assert "red" in str(e.value) and "green" in str(e.value)


def test_bool_flags():
    assert ArgParser(Args).parse(["--width=1", "--flag=true"]).flag is True
    assert ArgParser(Args).parse(["--width=1", "--flag=false"]).flag is False
    with pytest.raises(InvalidArgumentValue):
        ArgParser(Args).parse(["--width=1", "--flag=maybe"])


def test_help_sentinel():
    with pytest.raises(HelpPassedInArgs):
        ArgParser(Args).parse(["--help"])
    with pytest.raises(HelpPassedInArgs):
        ArgParser(Args).parse(["-h"])


def test_usage_lists_enum_variants():
    usage = ArgParser(Args).usage()
    assert "--color" in usage
    assert "red" in usage and "green" in usage
    assert "(required)" in usage
    assert "(default: 100)" in usage


def test_profile_mode_normalization():
    """--profile accepts host/device/off AND every legacy bool spelling
    (the flag was a bool before the device mode landed)."""
    from zig_weekend_raytracer_tpu.cli import normalize_profile_mode

    for legacy_on in ("true", "1", "yes", "on", "TRUE", "Yes"):
        assert normalize_profile_mode(legacy_on) == "host", legacy_on
    for legacy_off in ("false", "0", "no", "off", "False"):
        assert normalize_profile_mode(legacy_off) == "off", legacy_off
    assert normalize_profile_mode("host") == "host"
    assert normalize_profile_mode("device") == "device"
    assert normalize_profile_mode("maybe") is None
