package graft

/** Shared x509 test fixtures (openssl-generated self-signed certs):
  * CN=alice/O=GraftTest — a user identity — and CN=relay-na/O=GraftMesh —
  * a peer-relay identity. Fingerprints are `openssl x509 -fingerprint
  * -sha256` with colons stripped (the reference's identity key format,
  * `core/src/pki/mod.rs:12-24`).
  */
object CertFixtures {

  val alicePem: String =
    """-----BEGIN CERTIFICATE-----
      |MIIDQzCCAiugAwIBAgIUS7P9aRUyZ5JX2XrjfgMS4e8YGrUwDQYJKoZIhvcNAQEL
      |BQAwMTEOMAwGA1UEAwwFYWxpY2UxEjAQBgNVBAoMCUdyYWZ0VGVzdDELMAkGA1UE
      |BhMCVVMwHhcNMjYwODEzMjMxODUwWhcNMzYwODEwMjMxODUwWjAxMQ4wDAYDVQQD
      |DAVhbGljZTESMBAGA1UECgwJR3JhZnRUZXN0MQswCQYDVQQGEwJVUzCCASIwDQYJ
      |KoZIhvcNAQEBBQADggEPADCCAQoCggEBAKv3UuRuqjeaLQK43Nj/o+aq7MXpUN35
      |so9fNH4e95MA7cS5SwhJSsE/Lpr+zLOKdpjMUlFkONSUrT4z7+jA5y0W9BYDkscU
      |iltGfRx/tq2x99OHmkNo3uZBJjmbNfbHADVhDp/5rrIg3r0nT7fRnVLRVXm5Oa1t
      |xPXIDoa5QvEAgNAwhVCX4t6p58sobXBBhnFkvjJJXpU8gTgV9P6vWnOSTTCr9Bfh
      |298nPUSxBpKcriPmTBJqV7Gpxkrla0eLDu2QA9OHGX3kSXvsktxeDkA6VbjDusyJ
      |soMgfyTNx82qNyIIrpDE94Xu5BoRQkzn65mYaYDVie9r5hEcvfFWaXMCAwEAAaNT
      |MFEwHQYDVR0OBBYEFBbD2FxCkwGsrFef6ap+LGIH0QFyMB8GA1UdIwQYMBaAFBbD
      |2FxCkwGsrFef6ap+LGIH0QFyMA8GA1UdEwEB/wQFMAMBAf8wDQYJKoZIhvcNAQEL
      |BQADggEBAGT30E/IQ9UTeAF5YFXdjJMMfma6g+Gf/EAKMBEncQIcnvx6xYAfDXJZ
      |8EZM5ACzqi5EK4/lS05MlMHHAwHR1lfMew+a60I/FnoiVbOy6MvugkF2+y5MdWzA
      |f3lyfBGZh52cU+NgPKd8kMbLlRrHjVI79FuCFEh5OinfZZ1yddj8I4XPii9KrNtt
      |ElhrsB1q1GLr95UtkuuEBjY3uh53+LbqO/L4g12zrZfoAX7h1FeOwlHIf0TGFi9h
      |5iN3V37WitDgExGF4riiaQrDWG+cy/qJEeJ2gBZHYbCmlsdg3NLCkzNmSPEQx8W/
      |tWgoFyhOs3hKO0cl67+2zEQNpv84f1Y=
      |-----END CERTIFICATE-----""".stripMargin

  val relayPem: String =
    """-----BEGIN CERTIFICATE-----
      |MIIDSTCCAjGgAwIBAgIUVZAWvSwQfdhoJ9u9UPhm2mg+HlUwDQYJKoZIhvcNAQEL
      |BQAwNDERMA8GA1UEAwwIcmVsYXktbmExEjAQBgNVBAoMCUdyYWZ0TWVzaDELMAkG
      |A1UEBhMCVVMwHhcNMjYwODEzMjMxODUwWhcNMzYwODEwMjMxODUwWjA0MREwDwYD
      |VQQDDAhyZWxheS1uYTESMBAGA1UECgwJR3JhZnRNZXNoMQswCQYDVQQGEwJVUzCC
      |ASIwDQYJKoZIhvcNAQEBBQADggEPADCCAQoCggEBALx9SWllx3LVtMiWV4iRr86/
      |m4RXWn2w6PwtIViYOBveOlEvbVvMBjapIfMjNFezIkmSo/ULRWGRE/keXeQCcMtn
      |sczaUqo+H5KICYibR0xsuG7mU19LZCQ3x8124F6sRjS/GBlAv7KgPceog3BWZbiy
      |6nnMoCLqc2k+abWrCUYGVkHr8HpX/d0E3WeDLACVZ1v0fHpIo7wtxFJgUSL3oUU9
      |kTjuNEzGZImVa54YHg1WPiNRPnSwWbLQ4jJTgj54Q9g5NoJT8PJ3lrs7qCkfW6/A
      |ADdF6l7u30ZniolHXXJFm+GdyMZdY1Wt4PnsRPQsy4ospdu2Dj+u1ylfYUk7lYsC
      |AwEAAaNTMFEwHQYDVR0OBBYEFCsBpE+V7XF1QLvpU43SsYM3WcCyMB8GA1UdIwQY
      |MBaAFCsBpE+V7XF1QLvpU43SsYM3WcCyMA8GA1UdEwEB/wQFMAMBAf8wDQYJKoZI
      |hvcNAQELBQADggEBAD4rUhWBETM7B630XHq1z4nlqQmsMqNlHgnm6k0kykA2/oSM
      |GS7zgDharsMYZ8jUGdbwutiYumMInWovjIOM8lRzYXIudvBjlChRbjgA/N4xnPPe
      |Q+7nbDS5DKGuojOTwH9OGvUgH68iMnb42hU9HfkLGgLr8ZbjJGUahkt5hm/uqOlG
      |OmLKqh25eSURE9A4KhQ+gkRxomdr3rVknTMVlXtS9Q400/b62PhQ/CBIzLFSix8c
      |gx4WtK8/nkxwWWTyan6RGgnSYQWjAW5sand2fTAi18wC9LjLUMG+4SGrrTGl8GCL
      |x9nj1iFHNjzScmMpDg00XwaTiRtNDRFBT8j5a/0=
      |-----END CERTIFICATE-----""".stripMargin

  val aliceFp: String =
    "F8564ABA2356632268A46990B06A4014D841073508E2BB0D65E1E81B3D6CE9FD"
  val relayFp: String =
    "B6482CFCDA5E3E30D3BBCC9E942BB1B1221B433F0D3D27ED1865571AA3B8122D"
}
