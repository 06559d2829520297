SELECT COUNT(*) FROM posts as p, postLinks as pl, tags as t, comments as c WHERE pl.PostId = p.Id AND t.ExcerptPostId = p.Id AND c.PostId = p.Id AND p.Score>=31 AND t.Count>=257;
