"""CLI entry points: `yond` (blind-denoise eval/benchmark) and
`trainer-awgn` (AWGN training), with the reference's flag surface."""
