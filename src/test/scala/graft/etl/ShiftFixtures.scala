package graft.etl

/** The reference's canonical test payloads, verbatim values
  * (etl/tests/test_shift_data_processor.py:48-228; FIXTURES.md §3-5). */
object ShiftFixtures {

  val shiftA: String =
    """{
      "id": "b2b9437a-28df-4ec4-8e4a-2bbdc241330b",
      "date": "2023-11-27",
      "start": 1701077400000,
      "finish": 1701108900000,
      "breaks": [
        {"id": "16419f82-8b9d-4434-a465-e150bd9c66b3",
         "start": 1701085620000, "finish": 1701087005277, "paid": false}
      ],
      "allowances": [
        {"id": "815ef6d1-3b8f-4a18-b7f8-a88b17fc695a", "value": 0.5, "cost": 2.5},
        {"id": "b38a088c-a65e-4389-b74d-0fb132e70629", "value": 0.5, "cost": 29.7},
        {"id": "cf36d58b-4737-4190-96da-1dac72ff5d2a", "value": 1.5, "cost": 12.2}
      ],
      "award_interpretations": []
    }"""

  val shiftB: String =
    """{
      "id": "d453dd32-4b0d-4b41-8d52-88f1142c3fe8",
      "date": "2023-11-28",
      "start": 1701160200000,
      "finish": 1701198000000,
      "breaks": [
        {"id": "6142ea7d-17be-4111-9a2a-73ed562b0f79",
         "start": 1701168180000, "finish": 1701169724388, "paid": true}
      ],
      "allowances": [],
      "award_interpretations": [
        {"id": "bacfb3d0-0b1f-4163-8e9f-f57f43b7a3a6", "date": "2023-11-28",
         "units": 1.0, "cost": 62.8},
        {"id": "60e7a113-ec1b-4ca1-b91e-1d4c1ff49b78", "date": "2023-11-28",
         "units": 1.5, "cost": 55.9}
      ]
    }"""

  /** Single page holding both shifts (tests:48-125). */
  val singlePage: String =
    s"""{"results": [$shiftA, $shiftB],
        "links": {"base": "http://localhost:8000/api/shifts", "prev": null, "next": null},
        "start": 0, "limit": 2, "size": 2}"""

  /** Two-page split with a relative next link (tests:127-240; FIXTURES §5). */
  val page1: String =
    s"""{"results": [$shiftA],
        "links": {"base": "http://localhost:8000/api/shifts",
                  "prev": null, "next": "/api/shifts?start=1&limit=1"},
        "start": 0, "limit": 1, "size": 2}"""

  val page2: String =
    s"""{"results": [$shiftB],
        "links": {"base": "http://localhost:8000/api/shifts",
                  "prev": "/api/shifts?start=0&limit=1", "next": null},
        "start": 1, "limit": 1, "size": 2}"""

  /** Rollback fixture (tests:242-300): shift B's break reuses shift A's
    * break_id → the whole batch must publish nothing. */
  val dupPkPage: String = {
    val dupB = shiftB.replace("6142ea7d-17be-4111-9a2a-73ed562b0f79",
      "16419f82-8b9d-4434-a465-e150bd9c66b3")
    s"""{"results": [$shiftA, $dupB],
        "links": {"base": "http://localhost:8000/api/shifts", "prev": null, "next": null},
        "start": 0, "limit": 2, "size": 2}"""
  }
}
