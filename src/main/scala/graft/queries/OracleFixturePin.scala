package graft.queries

/** ONE pin point for every `@volatile last*` oracle-dump fixture
  * carrier (round-14 verdict low: Similarity and Bpe each exposed
  * their own `pinOracleFixture`, and a future query family could
  * re-introduce the subset-Verify order-dependence by forgetting to
  * copy the call). Verify calls [[pin]] once before the query loop;
  * a new family with a fixture-keyed oracle artifact registers its
  * pin HERE, not in Verify. */
object OracleFixturePin {

  def pin(dir: String): Unit = {
    Similarity.pinOracleFixture(dir)
    Bpe.pinOracleFixture(dir)
    Multimodal.pinOracleFixture(dir)
  }
}
