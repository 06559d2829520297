SELECT COUNT(*) FROM posts as p, tags as t, postHistory as ph WHERE t.ExcerptPostId = p.Id AND ph.PostId = p.Id AND p.PostTypeId<=6;
