"""Sink configuration with the reference's constructor surface.

Mirrors the validation/default behavior of the reference constructors
(/root/reference/main.go:47-157) including exact error strings, re-expressed
as a frozen dataclass + classmethod constructors.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from streamsurfer_spark.envelope import extract_stream_name_from_arn

DEFAULT_REGION = "sa-east-1"  # main.go:48
DEFAULT_MAX_SIZE_BYTES = 1024  # bytes, not KB — code behavior (main.go:48; SURVEY §1.2)
DEFAULT_RETRY_MAX_ATTEMPTS = 5  # main.go:165


@dataclass(frozen=True)
class KinesisSinkConfig:
    stream_name: str
    region: str = DEFAULT_REGION
    max_size_bytes: int = DEFAULT_MAX_SIZE_BYTES
    origin: str = ""
    stream_arn: str = ""
    retry_max_attempts: int = DEFAULT_RETRY_MAX_ATTEMPTS

    def __post_init__(self) -> None:
        # main.go:130-140 — empty name and zero threshold are rejected;
        # empty region silently defaults.
        if self.stream_name == "":
            raise ValueError("streamName must be provided")
        if self.region == "":
            object.__setattr__(self, "region", DEFAULT_REGION)
        if self.max_size_bytes == 0:
            raise ValueError("maxSizeBytes must be provided")

    # Constructor surface R1-R4/R6 (main.go:47-105,129).
    @classmethod
    def new(cls, stream_name: str) -> "KinesisSinkConfig":
        return cls(stream_name)

    @classmethod
    def with_origin(cls, stream_name: str, origin: str) -> "KinesisSinkConfig":
        return cls(stream_name, origin=origin)

    @classmethod
    def with_origin_and_max_size(
        cls, stream_name: str, origin: str, max_size_bytes: int
    ) -> "KinesisSinkConfig":
        return cls(stream_name, origin=origin, max_size_bytes=max_size_bytes)

    @classmethod
    def with_stream_arn(cls, stream_arn: str, origin: str) -> "KinesisSinkConfig":
        if stream_arn == "":
            raise ValueError("streamArn must be provided")  # main.go:96
        stream_name = extract_stream_name_from_arn(stream_arn)
        return cls(stream_name, origin=origin, stream_arn=stream_arn)
