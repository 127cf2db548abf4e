package graft
class EntrySmokeSpec extends SparkSpec {
  test("driver entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
